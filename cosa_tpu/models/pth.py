"""Torch-free reader for torch zip-format ``.pth`` checkpoints.

The weight-port path (models/convert.py, scripts/parity_voc.py) consumes
reference checkpoints saved by ``torch.save`` (utils/torch_helper.py:101-117
``save_best`` containers and plain timm state_dicts). A parity host need not
have torch installed, so this module reads the zip serialization format
(torch >= 1.6: a zip holding ``data.pkl`` + one raw little-endian buffer per
storage under ``data/``) with a minimal, SAFELISTED unpickler:

  * only ``torch._utils._rebuild_tensor_v2``, storage dtype tags,
    ``collections.OrderedDict`` and a handful of stdlib containers resolve
    to real objects;
  * every other global (argparse.Namespace in the ``args`` slot of CoSA
    containers, optimizer classes, ...) resolves to an inert stub that
    swallows its state — so unlike ``torch.load(weights_only=False)``
    nothing in the pickle stream can execute arbitrary code here;
  * tensors materialize as numpy arrays (bf16/f16 via ml_dtypes, which jax
    already depends on), honoring storage offset + strides, so
    non-contiguous saved views round-trip exactly.

``load_torch_checkpoint`` (convert.py) tries this reader first and falls
back to torch.load only for pre-1.6 legacy pickles — torch is now an
optional dependency of the port path, exercised by
tests/test_convert_parity.py with the torch import blocked.
"""

from __future__ import annotations

import pickle
import zipfile
from typing import Any, Dict

import numpy as np

try:  # jax's own dtype extension package — always present alongside jax
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    _BF16 = np.dtype(np.uint16)  # raw bits; converter casts f32 anyway

# torch storage tag -> numpy dtype (modern streams use torch.<dtype> tags via
# the UntypedStorage path, older ones the *Storage class names; both appear
# as the second element of the persistent id)
_DTYPES = {
    "FloatStorage": np.dtype(np.float32), "float32": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64), "float64": np.dtype(np.float64),
    "HalfStorage": np.dtype(np.float16), "float16": np.dtype(np.float16),
    "LongStorage": np.dtype(np.int64), "int64": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32), "int32": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16), "int16": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8), "int8": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8), "uint8": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_), "bool": np.dtype(np.bool_),
    "BFloat16Storage": _BF16, "bfloat16": _BF16,
}


class _DtypeTag:
    """Stand-in for a ``torch.FloatStorage``-style global in the pickle."""

    def __init__(self, dtype: np.dtype):
        self.dtype = dtype


class _Stub:
    """Inert stand-in for any non-safelisted global: constructible with any
    arguments, absorbs __setstate__/attribute writes, never executes."""

    def __init__(self, *args, **kwargs):
        self._stub_args = args

    def __setstate__(self, state):
        self._stub_state = state

    def __call__(self, *args, **kwargs):  # REDUCE on an instance
        return _Stub()


def _rebuild_tensor_v2(storage, offset, size, stride, requires_grad=False,
                       backward_hooks=None, metadata=None):
    buf, dtype = storage
    flat = np.frombuffer(buf, dtype=dtype)
    if not size:
        return flat[offset].copy()
    itemsize = dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        flat[offset:], shape=tuple(size),
        strides=tuple(int(s) * itemsize for s in stride))
    return np.ascontiguousarray(view)


_SAFE = {
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("collections", "OrderedDict"): dict,
    ("builtins", "list"): list,
    ("builtins", "dict"): dict,
    ("builtins", "set"): set,
    ("builtins", "tuple"): tuple,
    ("builtins", "bytearray"): bytearray,
    ("builtins", "complex"): complex,
    ("numpy.core.multiarray", "_reconstruct"): None,  # filled below
    ("numpy", "ndarray"): np.ndarray,
    ("numpy", "dtype"): np.dtype,
}
try:
    from numpy.core.multiarray import _reconstruct as _np_reconstruct

    _SAFE[("numpy.core.multiarray", "_reconstruct")] = _np_reconstruct
except Exception:  # pragma: no cover
    del _SAFE[("numpy.core.multiarray", "_reconstruct")]


class _Unpickler(pickle.Unpickler):
    def __init__(self, f, zf: zipfile.ZipFile, prefix: str):
        super().__init__(f)
        self._zf = zf
        self._prefix = prefix
        self._storages: Dict[str, Any] = {}

    def find_class(self, module: str, name: str):
        if (module, name) in _SAFE:
            return _SAFE[(module, name)]
        if module == "torch" and name in _DTYPES:
            return _DtypeTag(_DTYPES[name])
        if name in _DTYPES:  # torch.FloatStorage et al.
            return _DtypeTag(_DTYPES[name])
        return _Stub  # anything else is inert

    def persistent_load(self, pid):
        # ('storage', dtype_tag, key, location, numel)
        typ, tag, key, _location, _numel = pid
        assert typ == "storage", f"unknown persistent id {typ!r}"
        if key not in self._storages:
            dtype = tag.dtype if isinstance(tag, _DtypeTag) else _DTYPES[
                getattr(tag, "__name__", str(tag))]
            self._storages[key] = (
                self._zf.read(self._prefix + "data/" + str(key)), dtype)
        return self._storages[key]


def load_pth_numpy(path: str) -> Any:
    """Read a torch zip-format checkpoint into plain python + numpy.
    Raises ``zipfile.BadZipFile`` on the pre-1.6 legacy pickle format
    (callers fall back to torch.load for those)."""
    with zipfile.ZipFile(path) as zf:
        pkl = [n for n in zf.namelist() if n.split("/")[-1] == "data.pkl"]
        if not pkl:
            raise zipfile.BadZipFile(f"{path}: no data.pkl member")
        prefix = pkl[0][: -len("data.pkl")]
        import io

        up = _Unpickler(io.BytesIO(zf.read(pkl[0])), zf, prefix)
        return up.load()
