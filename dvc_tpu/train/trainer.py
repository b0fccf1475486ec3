"""Training loop: jitted step, optimizer, LR schedule, checkpoints.

Reference: ``train.py:32-317``.  Adam/AdamW + epoch-level MultiStepLR
(``train.py:122-129``), global-norm gradient clipping, scheduled-sampling
probability ramp (``train.py:152-156``), best/last checkpointing with an
``info.json`` carrying the full option dict and score histories
(``train.py:222-295``).

TPU design: one compiled train step (forward incl. Hungarian matching +
backward + Adam update); the learning rate is a step input so MultiStepLR
does not retrigger compilation; batches are sharded over the mesh's data
axis, so the same step runs 1-chip or N-chip.
"""

from __future__ import annotations

import json
import os
import pickle
import time
from functools import partial


import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import PDVC, PDVCConfig, build_weight_dict
from ..parallel.mesh import (make_mesh, replicate_tree, shard_batch,
                             shard_batch_axis1)


def multistep_lr(opt, epoch: int) -> float:
    """MultiStepLR(milestones=start + every*k, gamma) (reference train.py:128)."""
    start = opt.learning_rate_decay_start
    every = opt.learning_rate_decay_every
    gamma = opt.learning_rate_decay_rate
    n_milestones = int((opt.epoch - start) / every) if every > 0 else 0
    milestones = [start + every * k for k in range(max(n_milestones, 0))]
    passed = sum(1 for m in milestones if epoch >= m)
    return opt.lr * (gamma ** passed)


def step_prng_key(opt, seed: int):
    """Root key for the per-step training RNG stream (dropout + scheduled
    sampling).  Default impl is 'rbg' (XLA-native generator): the
    threefry2x32 default costs ~2 ms/step at flagship shapes just
    generating dropout bits (round-4 HW A/B: 28.06 ms/step rbg vs 30.02
    threefry vs 27.42 no-dropout, B=16) — the reference's cuDNN dropout
    is likewise a native generator, so statistical (not bitwise) parity
    is the contract.  Scoped to the step stream via a typed key: param
    init and data pipelines keep threefry.  --tpu_prng threefry restores
    the old stream bit-for-bit."""
    impl = getattr(opt, 'tpu_prng', 'rbg')
    if impl == 'threefry':
        return jax.random.PRNGKey(seed)
    return jax.random.key(seed, impl=impl)


def ss_prob_for_epoch(opt, epoch: int) -> float:
    """Scheduled-sampling ramp (reference train.py:152-156)."""
    if opt.scheduled_sampling_start >= 0 and epoch > opt.scheduled_sampling_start:
        frac = ((epoch - opt.scheduled_sampling_start)
                // opt.scheduled_sampling_increase_every)
        return min(opt.basic_ss_prob
                   + opt.scheduled_sampling_increase_prob * frac,
                   opt.scheduled_sampling_max_prob)
    return 0.0


def make_optimizer(opt):
    if opt.optimizer_type == 'adamw':
        base = optax.adamw(1.0, weight_decay=opt.weight_decay)
    else:
        base = optax.adam(1.0)
        if opt.weight_decay:
            base = optax.chain(
                optax.add_decayed_weights(opt.weight_decay), base)
    # lr is injected per step via scale-by-schedule on a state-free scalar
    return optax.chain(optax.clip_by_global_norm(opt.grad_clip), base)


def ensure_cpu_backend():
    """Expose the host CPU platform next to the TPU one (for fast eager
    init); must run before any JAX backend is initialized."""
    try:
        platforms = os.environ.get('JAX_PLATFORMS', '')
        if platforms and 'cpu' not in platforms:
            jax.config.update('jax_platforms', platforms + ',cpu')
    except Exception:
        pass


def enable_compilation_cache(path: str = None):
    """Persistent XLA compilation cache — first run warms it, later runs
    (e.g. the driver's bench invocation) skip the multi-minute compiles of
    the full train step on the remote-compile TPU path."""
    path = path or os.environ.get('DVC_JAX_CACHE',
                                  os.path.expanduser('~/.dvc_tpu_jax_cache'))
    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)
    except Exception:
        pass


class Trainer:
    def __init__(self, opt, mesh=None, model=None):
        self.opt = opt
        enable_compilation_cache()
        self.cfg = PDVCConfig.from_opt(opt)
        self.model = model if model is not None else PDVC(self.cfg)
        self.weight_dict = build_weight_dict(opt)
        self.tx = make_optimizer(opt)
        self.mesh = mesh if mesh is not None else make_mesh(
            n_data=getattr(opt, 'tpu_mesh_data', 1))
        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0, 1),
                                   static_argnums=(6,))
        self._eval_step = jax.jit(partial(self.model.apply, eval_mode=True))

    # ------------------------------------------------------------------
    def _init_twin(self):
        """Same model with the XLA-portable deformable-attention impl —
        parameters are identical across impls, so a CPU init of the twin
        yields valid params for the Pallas model."""
        import dataclasses
        cfg2 = dataclasses.replace(self.cfg, msda_impl='dense')
        from ..models.fusion import FusionPDVC
        if isinstance(self.model, FusionPDVC):
            return FusionPDVC(cfg2, fusion_dim=self.model.fusion_dim,
                              fusion_heads=self.model.fusion_heads,
                              fusion_dtype=self.model.fusion_dtype)
        if isinstance(self.model, PDVC):
            return PDVC(cfg2)
        return self.model

    def param_shapes(self, example_batch, seed=0):
        """Shape/dtype skeleton of the parameter tree via ``jax.eval_shape``
        — trace-only, no XLA compile, no FLOPs.  Enough for checkpoint
        restore (structure + shape validation); seconds instead of the
        minutes a real ``init`` costs on a single-core host."""
        rngs = {'params': jax.random.PRNGKey(seed),
                'dropout': jax.random.PRNGKey(seed + 1),
                'sample': jax.random.PRNGKey(seed + 2)}
        twin = self._init_twin()
        return jax.eval_shape(
            lambda b: twin.init(rngs, b, eval_mode=False), example_batch)

    def eval_state_from_checkpoint(self, example_batch, ck_path):
        """Build an eval-only state directly from a checkpoint, skipping
        ``init_state``'s full model init (which compiles the train graph
        just to produce params that the checkpoint then overwrites)."""
        shapes = self.param_shapes(example_batch)
        ck = load_checkpoint(ck_path, flax_params=shapes)
        params = jax.tree_util.tree_map(jnp.asarray, ck['params'])
        params = replicate_tree(params, self.mesh)
        return ({'params': params, 'opt_state': None,
                 'step': ck.get('step', 0)}, ck)

    def init_state(self, example_batch, seed=0):
        rngs = {'params': jax.random.PRNGKey(seed),
                'dropout': jax.random.PRNGKey(seed + 1),
                'sample': jax.random.PRNGKey(seed + 2)}
        # initialize on the host CPU backend when available: init is a
        # one-shot eager trace whose many small programs are pathologically
        # slow through a remote-compile TPU tunnel
        try:
            cpu = jax.local_devices(backend='cpu')[0]
        except RuntimeError:
            cpu = None
        if cpu is not None and jax.default_backend() != 'cpu':
            cpu_batch = jax.tree_util.tree_map(
                lambda x: jax.device_put(np.asarray(x), cpu), example_batch)
            with jax.default_device(cpu):
                params = self._init_twin().init(rngs, cpu_batch,
                                                eval_mode=False)
        else:
            params = self.model.init(rngs, example_batch, eval_mode=False)
        opt_state = self.tx.init(params)
        if self.mesh.shape.get('model', 1) > 1:
            # tensor-parallel placement of the FFN bulk; Adam moments
            # follow their parameters
            from ..parallel.sharding_rules import param_shardings
            sh = param_shardings(params, self.mesh)
            params = jax.tree_util.tree_map(jax.device_put, params, sh)

            def place_like(x):
                # opt_state leaves that mirror a param tree get its sharding
                return jax.tree_util.tree_map(jax.device_put, x, sh) \
                    if jax.tree_util.tree_structure(x) == \
                    jax.tree_util.tree_structure(sh) else \
                    replicate_tree(x, self.mesh)
            opt_state = jax.tree_util.tree_map(
                place_like, opt_state,
                is_leaf=lambda x: jax.tree_util.tree_structure(x)
                == jax.tree_util.tree_structure(sh))
        else:
            params = replicate_tree(params, self.mesh)
            opt_state = replicate_tree(opt_state, self.mesh)
        return {'params': params, 'opt_state': opt_state, 'step': 0}

    # ------------------------------------------------------------------
    def _train_step_impl(self, params, opt_state, batch, lr, ss_prob, rng,
                         ss_enabled=False):
        """ss_enabled must be static (it selects the caption-scan code
        path): False hoists the token/vocab matmuls out of the word scan;
        True keeps them inside so scheduled sampling can feed back."""
        r_drop, r_samp = jax.random.split(rng)

        def loss_fn(p):
            out, losses = self.model.apply(
                p, batch, eval_mode=False, ss_prob=ss_prob,
                ss_enabled=ss_enabled,
                rngs={'dropout': r_drop, 'sample': r_samp})
            total = sum(losses[k] * w for k, w in self.weight_dict.items()
                        if k in losses and w)
            return total, losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        # base optimizer runs at lr=1; scale here so MultiStepLR changes
        # don't retrigger compilation
        updates = jax.tree_util.tree_map(lambda u: lr * u, updates)
        params = optax.apply_updates(params, updates)
        losses['total_loss'] = total
        return params, opt_state, losses

    # ------------------------------------------------------------------
    def _multi_step_impl(self, params, opt_state, batches, lr, ss_prob,
                         rng, ss_enabled=False):
        """lax.scan over K stacked batches — one dispatch for K optimizer
        steps, amortizing host->device launch latency (useful when the
        host link is long, e.g. remote TPU tunnels)."""
        def body(carry, batch):
            p, o, r = carry
            r, r_step = jax.random.split(r)
            p, o, losses = self._train_step_impl(p, o, batch, lr, ss_prob,
                                                 r_step, ss_enabled)
            return (p, o, r), losses

        (params, opt_state, _), losses = jax.lax.scan(
            body, (params, opt_state, rng), batches)
        return params, opt_state, losses

    def train_steps(self, state, batches, lr, ss_prob, rng):
        """Run len(batches) optimizer steps in one compiled dispatch.

        batches: list of batch dicts (identical shapes).  Returns the new
        state and per-step loss dicts stacked on the leading axis.
        """
        if getattr(self.opt, 'caption_len_bucketing', 1):
            # one bucket for the whole stack (scan bodies share shapes):
            # slice every batch to the K-stack's longest caption
            longest = max(int(np.asarray(b['cap_mask']).sum(-1).max())
                          for b in batches) if batches else 0
            batches = [self.bucket_caption_length(b, floor=longest)
                       for b in batches]
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *batches)
        stacked = shard_batch_axis1(stacked, self.mesh)
        if not hasattr(self, '_multi_step'):
            self._multi_step = jax.jit(self._multi_step_impl,
                                       donate_argnums=(0, 1),
                                       static_argnums=(6,))
        from ..parallel.op_partition import op_mesh
        with op_mesh(self.mesh):
            params, opt_state, losses = self._multi_step(
                state['params'], state['opt_state'], stacked,
                jnp.float32(lr), jnp.float32(ss_prob), rng,
                float(ss_prob) > 0)
        state = {'params': params, 'opt_state': opt_state,
                 'step': state['step'] + len(batches)}
        return state, losses

    @staticmethod
    def bucket_caption_length(batch, multiple: int = 8, floor: int = 0):
        """Slice the caption tensors to the batch's longest caption (rounded
        up to ``multiple``) — the teacher-forcing scan then runs only as many
        word steps as needed.  Exactly equivalent: the dropped steps are
        fully masked, contributing zero loss.  A few length buckets means a
        few compiled variants instead of one per length.  ``floor`` forces a
        minimum length (multi-step stacks bucket to their joint longest)."""
        cap_mask = np.asarray(batch['cap_mask'])
        Lc = cap_mask.shape[-1]
        longest = int(cap_mask.sum(-1).max()) if cap_mask.size else Lc
        longest = max(longest, floor)
        bucket = min(max(-(-max(longest, 2) // multiple) * multiple, 2), Lc)
        if bucket == Lc:
            return batch
        out = dict(batch)
        out['cap_tensor'] = np.asarray(batch['cap_tensor'])[..., :bucket]
        out['cap_mask'] = cap_mask[..., :bucket]
        return out

    def _prep_train(self, batch):
        if getattr(self.opt, 'caption_len_bucketing', 1):
            batch = self.bucket_caption_length(batch)
        return shard_batch(batch, self.mesh)

    def prepare_batch(self, batch):
        """Host-side batch prep: caption-length bucketing + the (async)
        ``device_put`` onto the mesh.  ``DevicePrefetchLoader`` calls this
        one batch ahead so the transfer overlaps the running step; the
        returned dict is marked so ``train_step`` skips re-prepping."""
        batch = self._prep_train(batch)
        batch['_prepared'] = True
        return batch

    def train_step(self, state, batch, lr, ss_prob, rng):
        batch = dict(batch)
        if not batch.pop('_prepared', False):
            batch = self._prep_train(batch)
        # trace-time mesh advertisement: pallas_call is opaque to GSPMD, so
        # the deformable ops shard_map their kernels over the data axis and
        # sequence-parallel constraints name the mesh axes (op_partition.py)
        from ..parallel.op_partition import op_mesh
        with op_mesh(self.mesh):
            params, opt_state, losses = self._train_step(
                state['params'], state['opt_state'], batch,
                jnp.float32(lr), jnp.float32(ss_prob), rng,
                float(ss_prob) > 0)
        state = {'params': params, 'opt_state': opt_state,
                 'step': state['step'] + 1}
        return state, losses

    def prepare_eval_batch(self, batch):
        """Eval-side ``prepare_batch`` (sharded async device_put, no
        bucketing — eval decodes a fixed max length)."""
        batch = shard_batch(batch, self.mesh)
        batch['_prepared'] = True
        return batch

    def eval_step(self, state, batch):
        batch = dict(batch)
        if not batch.pop('_prepared', False):
            batch = shard_batch(batch, self.mesh)
        from ..parallel.op_partition import op_mesh
        with op_mesh(self.mesh):
            return self._eval_step(state['params'], batch)


# ----------------------------------------------------------------------
# checkpointing (reference train.py:225-234 / info.json semantics)
# ----------------------------------------------------------------------

def save_checkpoint(save_dir: str, tag: str, state: dict, epoch: int,
                    extra: dict | None = None, backend: str | None = None):
    """best/last checkpoints (reference train.py:225-234).

    backend 'pickle' (default) writes one atomic file; 'orbax' (or
    DVC_CKPT_BACKEND=orbax) uses an Orbax StandardCheckpointer directory —
    async-friendly and multi-host safe."""
    os.makedirs(save_dir, exist_ok=True)
    backend = backend or os.environ.get('DVC_CKPT_BACKEND', 'pickle')
    payload = {
        'epoch': epoch,
        'params': jax.tree_util.tree_map(np.asarray, state['params']),
        'opt_state': jax.tree_util.tree_map(np.asarray, state['opt_state']),
        'step': state['step'],
    }
    if extra:
        payload.update(extra)
    if backend == 'orbax':
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(save_dir, f'model-{tag}.orbax'))
        with ocp.StandardCheckpointer() as ckptr:
            tmp_path = path + '.new'
            if os.path.exists(tmp_path):
                import shutil
                shutil.rmtree(tmp_path)
            ckptr.save(tmp_path, payload)
            ckptr.wait_until_finished()
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        os.replace(tmp_path, path)
        return path
    path = os.path.join(save_dir, f'model-{tag}.ckpt')
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, flax_params=None):
    """Load a checkpoint: flax pickle, Orbax directory, or a reference
    torch PDVC ``.pth`` (converted on the fly via ``convert_pdvc`` —
    pass ``flax_params`` for shape validation / head-count inference)."""
    if path.endswith('.pth'):
        from ..models.pdvc_converter import convert_fusion, convert_pdvc
        from ..models.tsp.converter import load_torch_state_dict
        sd = load_torch_state_dict(path)
        # a NewModel checkpoint (newTrain.py:404-417) carries the PDVC
        # under a 'pdvcModel.' prefix plus the fusion attention blocks
        is_fusion = any(k.startswith(('pdvcModel.', 'module.pdvcModel.'))
                        for k in sd)
        conv = convert_fusion if is_fusion else convert_pdvc
        converted = conv(sd, flax_params)
        return {'epoch': 0, 'step': 0,
                'params': {'params': jax.tree_util.tree_map(
                    jnp.asarray, converted)}}
    if path.endswith('.orbax') or os.path.isdir(path):
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(os.path.abspath(path))
    with open(path, 'rb') as f:
        payload = pickle.load(f)
    return payload


ENCODER_KEYS = ('base_encoder', 'encoder_layer_', 'level_embed', 'input_proj')


def is_encoder_param(path_str: str) -> bool:
    """Name-filter rule for encoder/decoder partial restore
    (reference pdvc.py:103-108)."""
    return any(k in path_str for k in ENCODER_KEYS)


def filtered_restore(params, ckpt_params, which: str):
    """which in {'full', 'encoder', 'decoder'} (reference train.py:101-118)."""
    if which == 'full':
        return ckpt_params
    flat_new = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_ck = dict(jax.tree_util.tree_flatten_with_path(ckpt_params)[0])
    out = []
    for path, val in flat_new:
        ps = '/'.join(str(p) for p in path)
        take = is_encoder_param(ps) if which == 'encoder' else \
            not is_encoder_param(ps)
        src = flat_ck.get(path)
        out.append(jnp.asarray(src) if (take and src is not None) else val)
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, out)


def save_info_json(save_dir: str, info: dict):
    path = os.path.join(save_dir, 'info.json')
    with open(path, 'w') as f:
        json.dump(info, f, indent=1, default=str)


def load_info_json(save_dir: str):
    path = os.path.join(save_dir, 'info.json')
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None
