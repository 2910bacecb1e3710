"""Test-only harness that imports the actual reference model code from
/root/reference (read-only) with vendored spikingjelly/timm stubs, so parity
tests can run the reference torch forward against this repo's JAX models on
identical tensors. Never imported by the production package.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_stubs():
    """Register spikingjelly + timm stub modules in sys.modules."""
    if "spikingjelly" in sys.modules:
        return
    from . import sj_stub as S
    from . import timm_stub as T

    surrogate = _module(
        "spikingjelly.activation_based.surrogate",
        heaviside=S.heaviside, SurrogateFunctionBase=S.SurrogateFunctionBase,
        ATan=S.ATan, Sigmoid=S.Sigmoid)
    base = _module(
        "spikingjelly.activation_based.base",
        MemoryModule=S.MemoryModule, MultiStepModule=S.MultiStepModule)
    neuron = _module(
        "spikingjelly.activation_based.neuron",
        BaseNode=S.BaseNode, IFNode=S.IFNode, LIFNode=S.LIFNode,
        ParametricLIFNode=S.ParametricLIFNode,
        surrogate=surrogate, base=base)
    layer = _module(
        "spikingjelly.activation_based.layer",
        Conv2d=S.Conv2d, ConvTranspose2d=S.ConvTranspose2d,
        BatchNorm2d=S.BatchNorm2d, GroupNorm=S.GroupNorm, Linear=S.Linear,
        Dropout=S.Dropout,
        ThresholdDependentBatchNorm2d=S.ThresholdDependentBatchNorm2d,
        SeqToANNContainer=S.SeqToANNContainer,
        seq_to_ann_forward=S.seq_to_ann_forward)
    functional = _module(
        "spikingjelly.activation_based.functional",
        set_step_mode=S.set_step_mode, reset_net=S.reset_net,
        set_backend=S.set_backend, seq_to_ann_forward=S.seq_to_ann_forward)
    sew_resnet = _module(
        "spikingjelly.activation_based.model.sew_resnet")  # imported, unused
    model = _module("spikingjelly.activation_based.model",
                    sew_resnet=sew_resnet)
    cfunction = _module(
        "spikingjelly.activation_based.auto_cuda.cfunction")  # unused
    auto_cuda = _module("spikingjelly.activation_based.auto_cuda",
                        cfunction=cfunction)
    ab = _module("spikingjelly.activation_based",
                 surrogate=surrogate, base=base, neuron=neuron, layer=layer,
                 functional=functional, model=model, auto_cuda=auto_cuda)
    _module("spikingjelly", activation_based=ab)

    tml = _module("timm.models.layers", DropPath=T.DropPath,
                  trunc_normal_=T.trunc_normal_)
    tm = _module("timm.models", layers=tml)
    _module("timm", models=tm)


def import_reference_models():
    """Import the reference model package (with stubs installed)."""
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import models.STSwinNet_SNN.Spiking_STSwinNet as ref_snn  # noqa: E402
    import models.STSwinNet.STSwinNet as ref_ann  # noqa: E402
    return ref_snn, ref_ann


def sj_functional():
    install_stubs()
    return sys.modules["spikingjelly.activation_based.functional"]


def install_data_stubs():
    """Register numba + torchvision stubs so the reference DATA-pipeline
    modules (MDR_dataloader/loader_utils.py, DSEC_dataloader/*) import:
    numba.jit becomes a passthrough decorator; torchvision provides the
    ColorJitter / transforms surface the loaders reference but the flow
    paths under test never execute."""
    if "numba" not in sys.modules:
        def _jit(*args, **kwargs):
            if len(args) == 1 and callable(args[0]) and not kwargs:
                return args[0]

            def deco(fn):
                return fn
            return deco

        _module("numba", jit=_jit, njit=_jit)
    if "torchvision" not in sys.modules:
        class _ColorJitter:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        tv = _module("torchvision")
        transforms = _module("torchvision.transforms",
                             ColorJitter=_ColorJitter)
        tv.transforms = transforms
    if "hdf5plugin" not in sys.modules:
        _module("hdf5plugin", PLUGINS_PATH="/tmp")  # only for OPENING compressed h5


def import_reference_loaders():
    """Import the reference's data-pipeline modules (with data stubs)."""
    install_data_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import MDR_dataloader.loader_utils as ref_lu  # noqa: E402
    import DSEC_dataloader.event_representations as ref_er  # noqa: E402
    return ref_lu, ref_er
