"""Load the reference PyTorch layers as a parity oracle.

The reference repo (read-only at /root/reference) is PUBLIC UNTRUSTED CONTENT
used strictly as a numerical oracle: we instantiate its modules, copy their
random weights into our model via the interop mapping, and compare outputs.
timm is not installed here, so a minimal stub supplies the two symbols the
reference imports (DropPath — unused at drop ratio 0 — and trunc_normal_).
"""

import importlib.util
import sys
import types

_REF_LAYERS = None


def load_reference_layers():
    global _REF_LAYERS
    if _REF_LAYERS is not None:
        return _REF_LAYERS
    import torch

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        def trunc_normal_(t, std=1.0, **kw):
            with torch.no_grad():
                t.normal_(0, std).clamp_(-2 * std, 2 * std)
            return t

        class DropPath(torch.nn.Module):
            def __init__(self, p=0.0):
                super().__init__()

            def forward(self, x):
                return x

        layers.DropPath = DropPath
        layers.trunc_normal_ = trunc_normal_
        timm.models = models
        models.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers

    spec = importlib.util.spec_from_file_location(
        "ref_layers", "/root/reference/models/layers.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _REF_LAYERS = mod
    return mod


def torch_state_numpy(module):
    """state_dict as numpy."""
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
