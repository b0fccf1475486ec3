"""Import-time stubs that let the reference (read-only, /root/reference)
PDVC torch code run on CPU in this environment: the compiled CUDA extension
and torchvision are absent; only trivially-stubable surface is needed
(the CPU forward path uses ``ms_deform_attn_core_pytorch``, see reference
``pdvc/ops/modules/ms_deform_attn.py:119-124``)."""

import importlib.machinery
import logging
import sys
import types


def _stub_module(name):
    """types.ModuleType with a real ModuleSpec: importlib.util.find_spec
    raises ValueError on spec-less sys.modules entries, which breaks e.g.
    transformers' torchvision-availability probe in any test that runs
    after this module is collected."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def install():
    sys.modules.setdefault(
        'MultiScaleDeformableAttention',
        _stub_module('MultiScaleDeformableAttention'))

    if 'torchvision' not in sys.modules:
        tv = _stub_module('torchvision')
        tv_ops = _stub_module('torchvision.ops')
        tv_boxes = _stub_module('torchvision.ops.boxes')

        def box_area(boxes):
            return ((boxes[:, 2] - boxes[:, 0])
                    * (boxes[:, 3] - boxes[:, 1]))

        tv_boxes.box_area = box_area
        tv_ops.boxes = tv_boxes
        tv.ops = tv_ops
        tv.__version__ = '0.15.0'
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.ops'] = tv_ops
        sys.modules['torchvision.ops.boxes'] = tv_boxes

    if 'colorlog' not in sys.modules:
        colorlog = _stub_module('colorlog')
        colorlog.getLogger = logging.getLogger

        class _ColoredFormatter(logging.Formatter):
            def __init__(self, fmt=None, *a, **k):
                super().__init__(
                    fmt.replace('%(log_color)s', '') if fmt else None)

        colorlog.ColoredFormatter = _ColoredFormatter
        colorlog.StreamHandler = logging.StreamHandler
        sys.modules['colorlog'] = colorlog


def install_torchaudio():
    """torchaudio is absent from this box; the reference ``NewModel.py``
    only touches it at __init__ (``torchaudio.pipelines.HUBERT_BASE
    .get_model()``, NewModel.py:35-37) and inside ``get_mfcc`` (which the
    parity test monkeypatches away), so an Identity-model bundle stub is
    all the import needs."""
    if 'torchaudio' in sys.modules:
        return
    import torch

    ta = _stub_module('torchaudio')
    pipelines = _stub_module('torchaudio.pipelines')
    functional = _stub_module('torchaudio.functional')

    class _HubertBundle:
        sample_rate = 16000

        def get_model(self):
            return torch.nn.Identity()

    pipelines.HUBERT_BASE = _HubertBundle()
    ta.pipelines = pipelines
    ta.functional = functional
    sys.modules['torchaudio'] = ta
    sys.modules['torchaudio.pipelines'] = pipelines
    sys.modules['torchaudio.functional'] = functional
