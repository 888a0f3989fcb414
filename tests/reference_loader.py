"""Load individual reference modules for golden-parity tests.

The reference package's ``src/adapters/__init__.py`` is broken (imports
symbols that don't exist — SURVEY.md §0), so modules are loaded file-by-file,
bypassing package __init__. Tests using this must skip when /root/reference is
absent.
"""

import importlib.machinery
import importlib.util
import pathlib
import sys

REF = pathlib.Path("/root/reference")


def available() -> bool:
    return REF.exists()


def load(relpath: str, name: str):
    spec = importlib.util.spec_from_file_location(name, REF / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_with_ref_src(module_name: str):
    """Import a reference module that uses absolute ``src.*`` imports.

    Our repo ships its own ``src`` package (the CLI shim), so the reference's
    ``src`` tree is imported under isolation: existing src* modules are
    stashed, /root/reference is put at the head of sys.path, and the stash is
    restored afterwards. The loaded reference modules stay importable via the
    returned object only.
    """
    stash = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == "src" or k.startswith("src.")}
    sys.path.insert(0, str(REF))
    try:
        mod = importlib.import_module(module_name)
        loaded = {k: sys.modules[k] for k in list(sys.modules)
                  if k == "src" or k.startswith("src.")}
        for k in loaded:
            del sys.modules[k]
        return mod
    finally:
        sys.path.remove(str(REF))
        sys.modules.update(stash)


def ensure_torchvision_stub():
    """torchvision is not installed in this image, but the reference's
    dino/dinov2.py imports ``torchvision.transforms`` at module top (used
    only by UNetDecoder's resize_image path, dinov2.py:197-199) and
    datasets/classification.py uses ``T.RandomResizedCrop.get_params`` +
    ``F.{resized_crop,hflip,vflip}`` on PIL images. Install a faithful stub:
    tensor ``Resize`` delegates to ``F.interpolate(..., antialias=True)``
    (torchvision's own implementation since 0.17); the PIL functionals are
    the documented torchvision algorithms (get_params: 10 attempts of
    area-scaled boxes, fall back to the largest valid center crop)."""
    import math
    import types

    if "torchvision" in sys.modules:
        return
    try:
        if importlib.util.find_spec("torchvision") is not None:
            return
    except (ImportError, ValueError):
        pass
    import torch
    import torch.nn.functional as F

    class _InterpolationMode:
        NEAREST = "nearest"
        BILINEAR = "bilinear"
        BICUBIC = "bicubic"

    class _Resize:
        def __init__(self, size, interpolation="bilinear", antialias=True):
            self.size = size
            self.mode = getattr(interpolation, "value", interpolation)
            self.antialias = antialias

        def __call__(self, x):
            return F.interpolate(x, size=self.size, mode=self.mode,
                                 antialias=self.antialias)

    class _RandomResizedCrop:
        @staticmethod
        def get_params(img, scale, ratio):
            # torchvision.transforms.RandomResizedCrop.get_params, PIL input
            w, h = img.size
            area = h * w
            log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
            for _ in range(10):
                target_area = area * torch.empty(1).uniform_(*scale).item()
                aspect = math.exp(torch.empty(1).uniform_(*log_ratio).item())
                tw = int(round(math.sqrt(target_area * aspect)))
                th = int(round(math.sqrt(target_area / aspect)))
                if 0 < tw <= w and 0 < th <= h:
                    i = torch.randint(0, h - th + 1, (1,)).item()
                    j = torch.randint(0, w - tw + 1, (1,)).item()
                    return i, j, th, tw
            in_ratio = float(w) / float(h)  # fallback: center crop
            if in_ratio < min(ratio):
                tw, th = w, int(round(w / min(ratio)))
            elif in_ratio > max(ratio):
                th, tw = h, int(round(h * max(ratio)))
            else:
                tw, th = w, h
            return (h - th) // 2, (w - tw) // 2, th, tw

    def _hflip(img):
        import PIL.Image as Image

        return img.transpose(Image.FLIP_LEFT_RIGHT)

    def _vflip(img):
        import PIL.Image as Image

        return img.transpose(Image.FLIP_TOP_BOTTOM)

    def _resized_crop(img, i, j, h, w, size, interpolation="bilinear"):
        import PIL.Image as Image

        assert not isinstance(img, torch.Tensor), "stub handles PIL only"
        size = (size, size) if isinstance(size, int) else tuple(size)
        return img.crop((j, i, j + w, i + h)).resize(
            (size[1], size[0]), Image.BILINEAR)

    tv = types.ModuleType("torchvision")
    trs_pkg = types.ModuleType("torchvision.transforms")
    trs = types.ModuleType("torchvision.transforms.transforms")
    fun = types.ModuleType("torchvision.transforms.functional")
    # a bare ModuleType has __spec__=None, which makes importlib.util.
    # find_spec("torchvision") raise ValueError in ANY later caller —
    # transformers' import-time _is_package_available probe dies on it when
    # a test imports transformers after this stub is installed (pytest
    # imports all test modules at collection, so module-level stubbing
    # races test bodies). A real ModuleSpec keeps find_spec harmless;
    # transformers still concludes torchvision is absent (no dist metadata,
    # no __version__).
    for _m in (tv, trs_pkg, trs, fun):
        _m.__spec__ = importlib.machinery.ModuleSpec(_m.__name__, loader=None)
    for m in (trs_pkg, trs):
        m.Resize = _Resize
        m.InterpolationMode = _InterpolationMode
        m.RandomResizedCrop = _RandomResizedCrop
    fun.InterpolationMode = _InterpolationMode
    fun.hflip = _hflip
    fun.vflip = _vflip
    fun.resized_crop = _resized_crop
    trs_pkg.transforms = trs
    trs_pkg.functional = fun
    tv.transforms = trs_pkg
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = trs_pkg
    sys.modules["torchvision.transforms.transforms"] = trs
    sys.modules["torchvision.transforms.functional"] = fun
