"""TSP backbone pretraining — the reference's only truly distributed path.

Reference: ``video_backbone/TSP/train/train.py`` (DDP over NCCL with
DistributedSampler + SyncBatchNorm, per-group LRs scaled by world size,
per-iteration WarmupMultiStepLR, CE with ignore_index=-1 weighted by
per-head alphas).

TPU-native: one jitted step, batch sharded over the mesh's data axis (the
psum gradient reduction over ICI is XLA's job — DDP-allreduce equivalent);
per-group learning rates become per-leaf multipliers on the update tree
(backbone vs fc, stem frozen at 0 as in reference train.py:245-260);
SGD weight decay matches the torch formula (decay added to the gradient
before momentum, reference train.py:276-277).

BatchNorm: with ``tsp_train_bn`` the running statistics update during
training (mutable batch_stats); the batch-mean reduction under pjit data
sharding is computed over the global batch, which IS SyncBatchNorm
(reference train.py:241-242) — XLA inserts the cross-device collective.
Default remains frozen stats (TSP fine-tunes from Kinetics/IG65M
checkpoints barely move them, and frozen is cheaper).
"""

from __future__ import annotations

from bisect import bisect_right


import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.tsp import TSPModel, tsp_cross_entropy
from ..parallel.mesh import make_mesh, replicate_tree, shard_batch


def warmup_multistep_lr(base_lr: float, iteration: int, milestones,
                        gamma: float = 0.1, warmup_factor: float = 1 / 3,
                        warmup_iters: int = 5,
                        warmup_method: str = 'linear') -> float:
    """Per-iteration schedule (reference common/scheduler.py:5-47)."""
    warmup = 1.0
    if iteration < warmup_iters:
        if warmup_method == 'constant':
            warmup = warmup_factor
        else:
            alpha = float(iteration) / warmup_iters
            warmup = warmup_factor * (1 - alpha) + alpha
    return base_lr * warmup * gamma ** bisect_right(list(milestones),
                                                    iteration)


def lr_multiplier_tree(params, backbone_lr: float, fc_lr: float,
                       freeze_stem: bool = True):
    """Per-leaf LR multipliers: backbone params at backbone_lr, fc heads at
    fc_lr, stem frozen (reference train.py:245-260)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = []
    for path, _ in flat:
        ps = '/'.join(str(p) for p in path)
        if 'features' in ps:
            mult = 0.0 if (freeze_stem and 'stem' in ps) else backbone_lr
        else:
            mult = fc_lr
        out.append(mult)
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, out)


def _cast_floating(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree)


class TSPTrainer:
    def __init__(self, opt, mesh=None):
        self.opt = opt
        self.model = TSPModel(
            backbone=getattr(opt, 'backbone_tsp', 'mvit_v2_s'),
            num_classes=tuple(getattr(opt, 'tsp_num_classes', (1, 2))),
            num_heads=getattr(opt, 'tsp_num_heads', 2),
            concat_gvf=bool(getattr(opt, 'global_video_features', None)))
        self.alphas = tuple(getattr(opt, 'loss_alphas', (1.0, 1.0)))
        self.train_bn = bool(getattr(opt, 'tsp_train_bn', 0))
        # mixed precision: master weights/optimizer state stay f32; the
        # model forward/backward (the FLOP-heavy backbone matmuls/convs)
        # runs in bf16 with grads cast back to f32 at the param boundary.
        # The loss itself is computed from f32-cast logits.
        dt = str(getattr(opt, 'tsp_dtype', 'float32'))
        self.dtype = jnp.bfloat16 if dt in ('bf16', 'bfloat16') \
            else jnp.float32
        self.mesh = mesh if mesh is not None else make_mesh(
            n_data=getattr(opt, 'tpu_mesh_data', 1))
        # torch SGD semantics (reference train.py:276-277): g += wd * p,
        # then momentum, then the (per-leaf) lr scaling outside
        wd = float(getattr(opt, 'tsp_weight_decay', 0.005))
        self.tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.trace(decay=getattr(opt, 'momentum', 0.9)),
            optax.scale(-1.0))
        self._step = jax.jit(self._step_impl, donate_argnums=(0, 1))
        self._eval = jax.jit(self._eval_impl)

    def init_state(self, example_batch, seed=0):
        x = example_batch['clip']
        gvf = example_batch.get('gvf')
        variables = self.model.init(jax.random.PRNGKey(seed), x, gvf=gvf)
        opt_state = self.tx.init(variables['params'])
        lr_mult = lr_multiplier_tree(
            variables['params'],
            backbone_lr=getattr(self.opt, 'backbone_lr', 1e-5),
            fc_lr=getattr(self.opt, 'fc_lr', 5e-5))
        return {'variables': replicate_tree(variables, self.mesh),
                'opt_state': replicate_tree(opt_state, self.mesh),
                'lr_mult': replicate_tree(lr_mult, self.mesh),
                'step': 0}

    def _model_inputs(self, variables, params, batch):
        """Cast the compute path to self.dtype (no-op at f32): params and
        clip/gvf run bf16, master params stay f32 (grad flows back through
        the cast, arriving f32 at the optimizer)."""
        v = dict(variables)
        if self.dtype != jnp.float32:
            v = _cast_floating(v, self.dtype)
            params = _cast_floating(params, self.dtype)
            batch = dict(batch,
                         clip=batch['clip'].astype(self.dtype),
                         **({'gvf': batch['gvf'].astype(self.dtype)}
                            if 'gvf' in batch else {}))
        v['params'] = params
        return v, batch

    def _step_impl(self, variables, opt_state, lr_mult, batch, lr_scale):
        def loss_fn(params):
            v, b = self._model_inputs(variables, params, batch)
            if self.train_bn:
                logits, mutated = self.model.apply(
                    v, b['clip'], gvf=b.get('gvf'), train=True,
                    mutable=['batch_stats'])
            else:
                logits = self.model.apply(v, b['clip'], gvf=b.get('gvf'))
                mutated = {}
            losses = [tsp_cross_entropy(lg.astype(jnp.float32),
                                        batch[f'label{i}'])
                      for i, lg in enumerate(logits)]
            total = sum(a * l for a, l in zip(self.alphas, losses))
            return total, (losses, mutated)

        (total, (losses, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables['params'])
        updates, opt_state = self.tx.update(grads, opt_state,
                                            variables['params'])
        updates = jax.tree_util.tree_map(
            lambda u, m: u * m * lr_scale, updates, lr_mult)
        params = optax.apply_updates(variables['params'], updates)
        new_vars = dict(variables)
        new_vars['params'] = params
        if self.train_bn and 'batch_stats' in mutated:
            # keep running stats in f32 even when compute ran bf16
            new_vars['batch_stats'] = _cast_floating(
                jax.lax.stop_gradient(mutated['batch_stats']), jnp.float32)
        metrics = {'total': total}
        for i, l in enumerate(losses):
            metrics[f'head{i}'] = l
        return new_vars, opt_state, metrics

    def _eval_impl(self, variables, batch):
        """Forward + per-head CE for the validation loop (reference
        train/train.py:89-117); returns f32 logits for host-side accuracy
        meters."""
        v, b = self._model_inputs(variables, variables['params'], batch)
        logits = self.model.apply(v, b['clip'], gvf=b.get('gvf'))
        logits = [lg.astype(jnp.float32) for lg in logits]
        losses = [tsp_cross_entropy(lg, batch[f'label{i}'])
                  for i, lg in enumerate(logits)]
        total = sum(a * l for a, l in zip(self.alphas, losses))
        return logits, losses, total

    def eval_step(self, state, batch):
        batch = shard_batch(batch, self.mesh)
        return self._eval(state['variables'], batch)

    def train_step(self, state, batch, iteration):
        """lr per-iteration from WarmupMultiStepLR; base lrs are folded into
        lr_mult, so lr_scale carries only the schedule factor."""
        opt = self.opt
        milestones = getattr(opt, 'lr_milestones', (4, 6))
        sched = warmup_multistep_lr(
            1.0, iteration, milestones,
            gamma=getattr(opt, 'lr_gamma', 0.1),
            # reference train.py:286 passes warmup_factor=1e-5 (the
            # scheduler's own default of 1/3 is never used by the driver)
            warmup_factor=getattr(opt, 'lr_warmup_factor', 1e-5),
            warmup_iters=getattr(opt, 'lr_warmup_iters', 5))
        batch = shard_batch(batch, self.mesh)
        variables, opt_state, metrics = self._step(
            state['variables'], state['opt_state'], state['lr_mult'], batch,
            jnp.float32(sched))
        return ({'variables': variables, 'opt_state': opt_state,
                 'lr_mult': state['lr_mult'], 'step': state['step'] + 1},
                metrics)
