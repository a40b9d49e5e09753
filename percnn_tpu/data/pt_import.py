"""Torch-free reader for reference ``.pt`` checkpoints + layout mappers.

The reference commits trained PyTorch checkpoints per experiment
(``torch.save({'model_state_dict', 'optimizer_state_dict'}, ...)``,
train_2drd.py:417-424; files e.g. DataDrivenModeling/2d_gs_rd/model/
checkpoint.pt).  Loading them here lets the framework validate rollout
parity against reference-trained weights directly, and lets a reference
user migrate mid-project without retraining.

Two serialization formats exist, both parsed without torch:

- **legacy** (pre-1.6 default; what the reference ships): a raw stream of
  pickles — magic number, protocol version, sys_info, then the main object
  whose tensors are ``persistent_load`` references
  ``('storage', StorageType, key, location, numel)`` rebuilt via
  ``torch._utils._rebuild_tensor_v2``; then a pickled list of storage keys;
  then, per key in order, ``int64 numel`` + raw little-endian bytes.
- **zip** (1.6+): a zipfile with ``<name>/data.pkl`` (same pickle scheme,
  persistent ids carry numel too) and one raw file ``<name>/data/<key>``
  per storage.

Unpickling is *restricted*: only ``collections.OrderedDict``, the torch
tensor-rebuild helpers, and storage-type markers are honoured; any other
global resolves to an inert stub (so optimizer state with exotic objects
degrades gracefully instead of executing arbitrary reduce callables).
"""

from __future__ import annotations

import collections
import io
import pickle
import struct
import zipfile
from typing import Any

import numpy as np

_MAGIC = 0x1950A86A20F9469CFC6C

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
    "BFloat16Storage": np.dtype("<u2"),  # raw bits on disk; decoded to f32
}


def _decode_storage(raw: np.ndarray, storage_type: "_StorageType") -> np.ndarray:
    """Post-process raw storage bytes; bf16 bits -> float32 values.

    numpy has no bfloat16, so BFloat16Storage reads as uint16 bit patterns;
    widening to the high half of a uint32 reconstructs the exact float32
    each bf16 value denotes (bf16 is f32 truncated to 16 mantissa-less bits).
    """
    if storage_type.name == "BFloat16Storage":
        return (raw.astype(np.uint32) << 16).view(np.float32)
    return raw


class _StorageType:
    """Marker for ``torch.FloatStorage`` etc. encountered in the pickle."""

    def __init__(self, name: str):
        self.name = name

    @property
    def dtype(self) -> np.dtype:
        return _STORAGE_DTYPES[self.name]


class _StorageRef:
    """Unresolved tensor storage: (dtype, key, numel); data attached later."""

    def __init__(self, storage_type: _StorageType, key: str, numel: int | None):
        self.storage_type = storage_type
        self.key = key
        self.numel = numel
        self.data: np.ndarray | None = None


class _PtArray(np.ndarray):
    """ndarray that remembers which checkpoint storage it came from.

    ``storage_ident = (storage_key, offset, shape)`` — two state-dict
    entries with the same ident are *aliases* of one nn.Parameter (e.g. the
    Burgers Stage-1 UpconvBlock registers up0/out AND a Sequential built
    from the same modules, so ``convnet.0.weight`` is ``up0.weight``,
    rcnn_Burgers...py:38-52).  torch's ``model.parameters()`` dedupes such
    aliases, which shifts optimizer-state indices — see map_adam_moments.
    Behaves as a plain array everywhere else (np.asarray drops the subclass).
    """

    storage_ident: tuple | None = None


class _LazyTensor:
    """Result of _rebuild_tensor_v2 before storages are bound."""

    def __init__(self, storage: _StorageRef, offset: int, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = tuple(size)
        self.stride = tuple(stride)

    def resolve(self) -> np.ndarray:
        flat = self.storage.data
        if flat is None:
            raise ValueError(f"storage {self.storage.key} has no data bound")
        itemsize = flat.dtype.itemsize
        arr = np.lib.stride_tricks.as_strided(
            flat[self.offset:],
            shape=self.size,
            strides=tuple(s * itemsize for s in self.stride),
        )
        out = np.ascontiguousarray(arr).view(_PtArray)
        out.storage_ident = (self.storage.key, self.offset, self.size)
        return out


class _Stub:
    """Inert stand-in for unknown globals (optimizer internals etc.)."""

    def __init__(self, *args, **kwargs):
        self.args = args

    def __call__(self, *args, **kwargs):
        return _Stub(*args)

    def __setstate__(self, state):
        self.state = state


def _rebuild_tensor_v2(storage, offset, size, stride, *unused):
    return _LazyTensor(storage, offset, size, stride)


def _rebuild_parameter(data, requires_grad=True, hooks=None):
    return data


class _RestrictedUnpickler(pickle.Unpickler):
    def __init__(self, f, persistent):
        super().__init__(f, encoding="latin1")
        self._persistent = persistent

    def find_class(self, module, name):
        if (module, name) == ("collections", "OrderedDict"):
            return collections.OrderedDict
        if name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
            return _rebuild_tensor_v2
        if name == "_rebuild_parameter":
            return _rebuild_parameter
        if name in _STORAGE_DTYPES:
            return _StorageType(name)
        if (module, name) == ("torch.serialization", "_get_layout"):
            return _Stub()
        return _Stub

    def persistent_load(self, pid):
        return self._persistent(pid)


def _resolve(obj: Any) -> Any:
    """Replace _LazyTensor leaves with numpy arrays; drop stubs."""
    if isinstance(obj, _LazyTensor):
        return obj.resolve()
    if isinstance(obj, dict):
        return {k: _resolve(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_resolve(v) for v in obj)
    if isinstance(obj, _Stub):
        return None
    return obj


def _storage_from_pid(pid, refs: dict) -> _StorageRef:
    # legacy pid: ('storage', StorageType, key, location, numel[, view_meta])
    # zip pid:    ('storage', StorageType, key, location, numel)
    tag = pid[0]
    if tag != "storage":
        raise ValueError(f"unsupported persistent id tag {tag!r}")
    storage_type, key, numel = pid[1], str(pid[2]), int(pid[4])
    if key not in refs:
        refs[key] = _StorageRef(storage_type, key, numel)
    return refs[key]


def _load_legacy(data: bytes) -> Any:
    f = io.BytesIO(data)
    refs: dict[str, _StorageRef] = {}
    up = lambda: _RestrictedUnpickler(f, lambda pid: _storage_from_pid(pid, refs))  # noqa: E731
    magic = up().load()
    if magic != _MAGIC:
        raise ValueError("not a torch legacy checkpoint (bad magic)")
    up().load()  # protocol version
    sys_info = up().load()
    if not sys_info.get("little_endian", True):
        raise ValueError("big-endian checkpoints unsupported")
    obj = up().load()
    keys = up().load()
    for key in keys:
        ref = refs[str(key)]
        (numel,) = struct.unpack("<q", f.read(8))
        nbytes = numel * ref.storage_type.dtype.itemsize
        raw = np.frombuffer(f.read(nbytes), dtype=ref.storage_type.dtype)
        ref.data = _decode_storage(raw, ref.storage_type)
    return _resolve(obj)


def _load_zip(path: str) -> Any:
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
        prefix = pkl_name[: -len("data.pkl")]
        refs: dict[str, _StorageRef] = {}
        up = _RestrictedUnpickler(
            io.BytesIO(zf.read(pkl_name)), lambda pid: _storage_from_pid(pid, refs)
        )
        obj = up.load()
        for key, ref in refs.items():
            raw = np.frombuffer(zf.read(f"{prefix}data/{key}"),
                                dtype=ref.storage_type.dtype)
            ref.data = _decode_storage(raw, ref.storage_type)
    return _resolve(obj)


def load_pt(path: str) -> Any:
    """Load a torch ``.pt`` checkpoint as a pytree of numpy arrays.

    Handles both the legacy stream format (what the reference commits) and
    the 1.6+ zipfile format.  Tensors become contiguous numpy arrays;
    unknown pickled objects become ``None``.
    """
    with open(path, "rb") as fh:
        head = fh.read(2)
        if head == b"PK":
            return _load_zip(path)
        data = head + fh.read()
    return _load_legacy(data)


# --------------------------------------------------------------------------
# Layout mappers: reference state_dict names -> percnn_tpu param pytrees.
# --------------------------------------------------------------------------

def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch Conv weight [Cout, Cin, *k] -> channels-last [*k, Cin, Cout]."""
    nd = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + nd)) + (1, 0))


def _convt_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose weight [Cin, Cout, *k] -> [*k, Cin, Cout]."""
    nd = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + nd)) + (0, 1))


def _pi_branch_w(w: np.ndarray) -> np.ndarray:
    """Pi branch conv weight -> cell layout ([Cin, Cout] when k=1)."""
    nd = w.ndim - 2
    hwio = _conv_w(w)
    if all(w.shape[2 + i] == 1 for i in range(nd)):
        return hwio.reshape(hwio.shape[-2:])  # 1x1: [Cin, Cout]
    return hwio


def _map_isg(sd: dict, prefix: str = "UpconvBlock.") -> dict | None:
    """Map reference ISG weights, auto-detecting the naming style.

    DataDrivenModeling scripts use a Sequential ('convnet.0' ConvT,
    'convnet.2' ConvT, 'convnet.3' 1x1 out — train_2drd.py:26-41); the
    discovery Stage-1/3 scripts use named members ('up0' ConvT, 'out' 1x1 —
    rcnn_Burgers...py:38-52; those checkpoints also carry 'convnet.*'
    aliases of the same tensors, which we ignore in favour of the named ones).
    """
    if f"{prefix}up0.weight" in sd:
        return {
            "up0_w": _convt_w(sd[f"{prefix}up0.weight"]),
            "up0_b": np.asarray(sd[f"{prefix}up0.bias"]),
            "out_w": _pi_branch_w(sd[f"{prefix}out.weight"]),
            "out_b": np.asarray(sd[f"{prefix}out.bias"]),
        }
    if f"{prefix}convnet.0.weight" in sd:
        return {
            "up0_w": _convt_w(sd[f"{prefix}convnet.0.weight"]),
            "up0_b": np.asarray(sd[f"{prefix}convnet.0.bias"]),
            "up1_w": _convt_w(sd[f"{prefix}convnet.2.weight"]),
            "up1_b": np.asarray(sd[f"{prefix}convnet.2.bias"]),
            "out_w": _pi_branch_w(sd[f"{prefix}convnet.3.weight"]),
            "out_b": np.asarray(sd[f"{prefix}convnet.3.bias"]),
        }
    return None


def map_pi_state_dict(
    sd: dict,
    *,
    cell_prefix: str = "crnn_cell.",
    n_branches: int = 3,
    channel_names: tuple = ("u", "v"),
    diff_names: tuple | None = None,
) -> tuple[dict, dict | None]:
    """Map a reference Pi-cell ``model_state_dict`` to (cell_params, isg_params).

    Reference module names (train_2drd.py:43-125, :26-41):
      crnn_cell.{CA,CB}                  -> diff logits [2]
      crnn_cell.Wh{1..3}_{u,v}.{weight,bias} -> pi[c] w0..w2 / b0..b2
      crnn_cell.Wh4_{u,v}.{weight,bias}      -> pi[c] w_out / b_out
      UpconvBlock.convnet.{0,2}.*  (ConvT)   -> isg up0/up1
      UpconvBlock.convnet.3.*      (1x1 out) -> isg out

    The LO forward solver names its raw diffusion scalars DA/DB
    (percnn_LO_eqn.py:42-43) and has no ISG — auto-detected.  The frozen
    ``W_laplace`` weight is ignored (the framework's Laplacian is the same
    stencil applied as a roll-sum; see ops/stencils.py).
    """
    if diff_names is None:
        diff_names = ("CA", "CB") if cell_prefix + "CA" in sd else ("DA", "DB")
    diff = np.stack([np.asarray(sd[cell_prefix + n], np.float32).reshape(())
                     for n in diff_names])
    pi = []
    for cn in channel_names:
        branch = {}
        for i in range(n_branches):
            w = sd[f"{cell_prefix}Wh{i + 1}_{cn}.weight"]
            branch[f"w{i}"] = _pi_branch_w(w)
            branch[f"b{i}"] = np.asarray(sd[f"{cell_prefix}Wh{i + 1}_{cn}.bias"])
        w4 = sd[f"{cell_prefix}Wh{n_branches + 1}_{cn}.weight"]
        branch["w_out"] = _pi_branch_w(w4)
        branch["b_out"] = np.asarray(sd[f"{cell_prefix}Wh{n_branches + 1}_{cn}.bias"])
        pi.append(branch)
    cell_params = {"diff": diff, "pi": pi}
    return cell_params, _map_isg(sd)


def map_symbolic_state_dict(
    sd: dict,
    *,
    cell_prefix: str = "crnn_cell.",
    channel_names: tuple = ("u", "v"),
    n_terms: int | None = None,
) -> tuple[dict, dict | None]:
    """Map a reference Stage-3 ``model_state_dict`` to (symbolic_params, isg_params).

    Reference Stage-3 names (fine_tuning_[5%noise...].py:123-157):
      crnn_cell.nu_{u,v}  -> nu [2];  crnn_cell.C{i}_{u,v} -> coef[c][i-1].
    Frozen derivative filters (laplace_op/dx_op/dy_op) are ignored — the
    framework evaluates terms via roll-sum stencils.
    """
    nu = np.stack([np.asarray(sd[f"{cell_prefix}nu_{c}"], np.float32).reshape(())
                   for c in channel_names])
    coef = []
    for cn in channel_names:
        cs = []
        i = 1
        while n_terms is None or i <= n_terms:
            key = f"{cell_prefix}C{i}_{cn}"
            if key not in sd:
                break
            cs.append(np.asarray(sd[key], np.float32).reshape(()))
            i += 1
        coef.append(np.stack(cs))
    return {"nu": nu, "coef": coef}, _map_isg(sd)


def _map_state_dict_like(sd: dict, map_kwargs: dict):
    """Apply the right layout mapper (Pi vs symbolic) to a state-dict-shaped
    mapping — used for the weights themselves AND for per-parameter
    optimizer moments (which transform identically, entry for entry)."""
    prefix = map_kwargs.get("cell_prefix", "crnn_cell.")
    if f"{prefix}nu_u" in sd:
        return map_symbolic_state_dict(sd, **map_kwargs)
    return map_pi_state_dict(sd, **map_kwargs)


def map_adam_moments(raw: dict, **map_kwargs) -> dict | None:
    """Map a reference ``optimizer_state_dict`` (torch.optim.Adam) to optax
    ``scale_by_adam`` moments.

    The reference saves and reloads the optimizer state on resume
    (``torch.save({'model_state_dict', 'optimizer_state_dict'}, ...)``,
    train_2drd.py:417-424, reload :432-439); importing it lets a mid-training
    reference run continue in-framework without an Adam cold start.

    torch Adam state is keyed by parameter *index* into the param-group
    list, which for ``optim.Adam(model.parameters())`` follows module
    registration order over *unique* parameters — ``model.parameters()``
    dedupes aliased tensors, so checkpoints whose UpconvBlock registers the
    same convs twice (named members + a Sequential, rcnn_Burgers...py:38-52)
    have fewer optimizer slots than state-dict entries.  Aliases are
    detected via the storages recorded by load_pt (``_PtArray.storage_ident``)
    and each moment is assigned to every alias name, so whichever name the
    layout mapper prefers sees it.  Frozen parameters (requires_grad=False,
    e.g. W_laplace) appear in the index space but never get state; their
    moments stay zero.

    Returns {'mu': (cell, isg), 'nu': (cell, isg), 'count': int} with
    cell/isg shaped exactly like the mapped weight pytrees (torch
    ``exp_avg``/``exp_avg_sq`` == optax ``mu``/``nu``; torch ``step`` ==
    optax ``count`` — both feed the same bias correction), or None when the
    checkpoint carries no optimizer state.
    """
    sd = raw.get("model_state_dict")
    opt = raw.get("optimizer_state_dict")
    if sd is None or not isinstance(opt, dict) or not opt.get("state"):
        return None
    # position space = registration order over UNIQUE parameters (aliases
    # dedupe to their first name, matching torch's model.parameters())
    names = []          # unique-position -> canonical name
    aliases = {}        # canonical name -> [all names sharing its storage]
    first_by_ident = {}
    for n, v in sd.items():
        ident = getattr(v, "storage_ident", None)
        if ident is not None and ident in first_by_ident:
            aliases[first_by_ident[ident]].append(n)
            continue
        if ident is not None:
            first_by_ident[ident] = n
        names.append(n)
        aliases[n] = [n]
    # two packings exist in the wild: state keyed by position index
    # (modern torch) or by raw param id() with param_groups carrying the
    # same ids in registration order (what the reference's checkpoints use)
    pg_ids = []
    for g in opt.get("param_groups") or []:
        pg_ids.extend(g.get("params") or [])
    id_to_pos = {int(pid): j for j, pid in enumerate(pg_ids)}
    if pg_ids and len(pg_ids) != len(names):
        # registered buffers live in the state dict but not in
        # model.parameters(); they shift every later position, and a
        # same-shaped buffer would dodge the per-tensor shape check below
        raise ValueError(
            f"checkpoint has {len(names)} unique state-dict tensors but its "
            f"optimizer tracks {len(pg_ids)} parameters; position-based "
            "moment assignment is ambiguous (registered buffers?)")
    mu_sd = {n: np.zeros_like(np.asarray(v)) for n, v in sd.items()}
    nu_sd = {n: np.zeros_like(np.asarray(v)) for n, v in sd.items()}
    count = 0
    for idx, st in opt["state"].items():
        k = int(idx)
        pos = id_to_pos[k] if k in id_to_pos else k
        if not 0 <= pos < len(names):
            raise ValueError(
                f"optimizer state key {k} resolves to position {pos}, out of "
                f"range for {len(names)} unique model parameters")
        for name in aliases[names[pos]]:
            ea = np.asarray(st["exp_avg"])
            if ea.shape != np.shape(sd[name]):
                # a registered buffer (absent from model.parameters()) would
                # shift the position space — fail loudly, never misassign
                raise ValueError(
                    f"optimizer state {k} (shape {ea.shape}) maps to "
                    f"parameter {name!r} (shape {np.shape(sd[name])}); the "
                    "checkpoint's parameter ordering doesn't match its "
                    "state dict (registered buffers?)")
            mu_sd[name] = ea
            nu_sd[name] = np.asarray(st["exp_avg_sq"])
        count = max(count, int(np.asarray(st["step"]).item()))
    mu_cell, mu_isg = _map_state_dict_like(mu_sd, map_kwargs)
    nu_cell, nu_isg = _map_state_dict_like(nu_sd, map_kwargs)
    return {"mu": (mu_cell, mu_isg), "nu": (nu_cell, nu_isg), "count": count}


def import_reference_checkpoint(path: str, **map_kwargs):
    """load_pt + the right mapper (Pi vs symbolic cell, auto-detected).

    Returns (cell_params, isg_params, raw) where raw is the full decoded
    checkpoint (including optimizer state) for inspection."""
    raw = load_pt(path)
    sd = raw["model_state_dict"] if "model_state_dict" in raw else raw
    cell, isg = _map_state_dict_like(sd, map_kwargs)
    return cell, isg, raw
