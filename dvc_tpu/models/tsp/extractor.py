"""Reusable TSP feature extractor: model + checkpoint + jitted features_fn.

Factored out of the ``extract_features.py`` driver so the streaming
decode -> features -> train pipeline (``dvc_tpu/data/streaming.py``) and
the batch .npy extraction path share one model-loading and inference
surface (reference counterpart: the model setup in
``video_backbone/TSP/extract_features/extract_features.py:203-231``)."""

from __future__ import annotations

import pickle

BACKBONE_INPUT_HW = {'mvit_v2_s': 224}
FEATURE_DIMS = {'mvit_v2_s': 768, 'r2plus1d_34': 512, 'r2plus1d_18': 512,
                'r3d_18': 512}


class FeatureExtractor:
    """TSP backbone in feature-extraction mode (``return_features=True``).

    ``features(x)`` maps a (B, clip_len, H, W, 3) float batch of decoded
    clips to (B, feat_dim) float32 clip features on the default device.
    """

    def __init__(self, backbone: str, checkpoint: str | None = None,
                 clip_len: int = 16, dtype: str = 'bfloat16',
                 variables=None):
        import jax
        import jax.numpy as jnp

        from . import TSPModel

        self.backbone = backbone
        self.clip_len = clip_len
        self.dtype = dtype
        self.input_hw = BACKBONE_INPUT_HW.get(backbone, 112)
        self.feat_dim = FEATURE_DIMS[backbone]
        model = TSPModel(backbone=backbone, num_classes=(1,), num_heads=1)
        if variables is None:
            dummy = jnp.zeros((1, clip_len, self.input_hw, self.input_hw, 3))
            variables = model.init(jax.random.PRNGKey(0), dummy)
            if checkpoint:
                variables = self._load_checkpoint(checkpoint, variables)
        if dtype == 'bfloat16':
            # inference-only cast: flax infers compute dtype from inputs
            variables = jax.tree_util.tree_map(
                lambda v: v.astype(jnp.bfloat16)
                if hasattr(v, 'dtype') and jnp.issubdtype(v.dtype,
                                                          jnp.floating)
                else v, variables)
        self.model = model
        self.variables = jax.device_put(variables, jax.devices()[0])

        @jax.jit
        def features_fn(x):
            if dtype == 'bfloat16':
                # the cast stays IN-GRAPH on an f32 input deliberately:
                # feeding bf16 from the host measures 10.6 ms/clip vs 4.82
                # with f32 input + this cast (HW A/B) — the bf16 (2,1)
                # sub-tiled layout of the 3-channel clip tensor makes the
                # patchify pad/reshape passes catastrophically slower,
                # far outweighing the saved cast + transfer bytes
                x = x.astype(jnp.bfloat16)
            _, feats = model.apply(self.variables, x, return_features=True)
            return feats.astype(jnp.float32)

        self.features = features_fn
        # host transfer dtype: f32 on purpose — see the cast note above
        self.input_dtype = jnp.float32

    def _load_checkpoint(self, checkpoint, variables):
        if checkpoint.endswith('.pth'):
            from . import (convert_mvit, convert_videoresnet,
                           load_torch_state_dict)
            sd = load_torch_state_dict(checkpoint)
            if self.backbone == 'mvit_v2_s':
                params, heads = convert_mvit(
                    sd, variables['params']['features'])
                new_params = {**variables['params'], 'features': params}
                for fc, tree in heads.items():
                    if fc in new_params:
                        new_params[fc] = tree
                return {'params': new_params}
            layers = {'r2plus1d_34': (3, 4, 6, 3)}.get(
                self.backbone, (2, 2, 2, 2))
            conv_type = ('r3d' if self.backbone == 'r3d_18'
                         else 'r2plus1d')
            params, stats = convert_videoresnet(sd, layers, conv_type)
            return {'params': {**variables['params'], 'features': params},
                    'batch_stats': {'features': stats}}
        with open(checkpoint, 'rb') as f:
            return pickle.load(f)['variables']

    def extract_video(self, filename: str, fps: float, video_frames: int,
                      frame_rate: float = 15, stride: int = 16,
                      batch_size: int = 32):
        """Decode + featurize one whole video -> (n_clips, feat_dim) f32
        numpy array (the per-video loop of ``extract_features.py``)."""
        import jax.numpy as jnp
        import numpy as np

        from ...data.video_clips import ClipBatcher, make_clip_table
        clips = make_clip_table(filename, fps, video_frames, self.clip_len,
                                frame_rate, stride)
        if not clips:
            return np.zeros((0, self.feat_dim), np.float32)
        from ...data.prefetch import PrefetchLoader
        feats = []
        batcher = ClipBatcher(clips, batch_size, self.clip_len, frame_rate,
                              self.backbone)

        def staged():
            for x, n, _ in batcher:
                # cast on host: halves the transfer, skips the in-graph
                # cast; device transfer while the previous batch computes
                yield jnp.asarray(np.asarray(x).astype(self.input_dtype)), n

        # background decode thread: cv2 decode + resize of the NEXT batch
        # overlaps the device forward of the current one
        for x, n in PrefetchLoader(staged()):
            feats.append(np.asarray(self.features(x))[:n])
        return np.concatenate(feats)
