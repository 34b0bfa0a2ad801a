"""Import the official Pangu-Weather ONNX weights (reference models/
onnx2torch.py:1-167) directly into a pangu_tpu param tree + aux constants.

The official graphs store:
  * initializers — the learnable weights, named like ``b1.a1.weight`` or
    ``onnx::MatMul_8952`` (graph-assigned ids). The id-based names cannot be
    derived structurally, so a name map CSV (torch_name,onnx_name — the
    format the reference ships as keys_all.csv) is taken as input.
  * Constant nodes — normalization statistics and constant masks, extracted
    by node name (reference models/onnx2torch.py:60-89):
      /b1/Constant_9..12  -> upper_mean/upper_std/surface_mean/surface_std
      /b1/Constant_44     -> constantMask{h} (3 surface masks, padded grid)
      /b1/Constant_17     -> const_h (constant upper channel)

Layout notes: ONNX MatMul weights are (in, out) — our Dense layout — so
linear kernels import without transposition (the reference transposes them
into torch's (out, in) and we would transpose back). Conv1d kernels are
(out, in, 1) and the dense earth bias is (1, nT, heads, T, T).
"""

from __future__ import annotations

import csv
import os
from typing import Dict, Mapping, Optional, Tuple

import numpy as np

from pangu_tpu.config import ModelConfig
from pangu_tpu.interop.torch_import import _t_bias_squeeze, _t_conv1d, _t_linear, reference_key_map

# Constant-node name -> aux file stem (reference models/onnx2torch.py:60-89)
DEFAULT_CONSTANT_MAP = {
    "/b1/Constant_9": "upper_mean",
    "/b1/Constant_10": "upper_std",
    "/b1/Constant_11": "surface_mean",
    "/b1/Constant_12": "surface_std",
    "/b1/Constant_44": "constantMask",
    "/b1/Constant_17": "Constant_17_output_0",
}


def load_name_map(csv_path: str) -> Dict[str, str]:
    """torch_name -> onnx_name pairs (keys_all.csv format)."""
    out: Dict[str, str] = {}
    with open(csv_path) as f:
        for row in csv.reader(f):
            if len(row) != 2 or row[0] == "torch_name":
                continue
            out[row[0].strip()] = row[1].strip()
    return out


def params_from_onnx_weights(
    cfg: ModelConfig,
    onnx_weights: Mapping[str, np.ndarray],
    name_map: Mapping[str, str],
    strict: bool = True,
) -> Dict:
    """Build {'params': ...} from an {onnx_name: array} dict."""
    tree: Dict = {}
    missing = []
    for torch_key, path, tr in reference_key_map(cfg):
        onnx_name = name_map.get(torch_key)
        if onnx_name is None or onnx_name not in onnx_weights:
            missing.append(torch_key)
            continue
        w = np.asarray(onnx_weights[onnx_name], dtype=np.float32)
        # our Dense layout == ONNX MatMul layout: linear kernels pass through
        if tr is _t_linear:
            value = np.ascontiguousarray(w)
        elif tr is _t_conv1d:
            value = np.ascontiguousarray(w[:, :, 0].T)
        elif tr is _t_bias_squeeze:
            value = np.asarray(w)[0]
        else:
            value = np.asarray(w)
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value
    if strict and missing:
        raise KeyError(
            f"{len(missing)} weights missing from the ONNX graph / name map, "
            f"e.g. {missing[:5]}"
        )
    return {"params": tree}


def read_onnx(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """(initializers, constant-node outputs) from an ONNX file. Needs onnx."""
    try:
        import onnx
        from onnx import numpy_helper
    except ImportError as e:  # pragma: no cover - environment gate
        raise ImportError(
            "the onnx package is required to read .onnx files; convert on a "
            "machine with onnx installed, then ship the .npz"
        ) from e

    graph = onnx.load(path).graph
    weights = {i.name: numpy_helper.to_array(i) for i in graph.initializer}
    constants: Dict[str, np.ndarray] = {}
    for node in graph.node:
        if node.op_type != "Constant":
            continue
        for attr in node.attribute:
            if attr.name == "value":
                constants[node.name] = numpy_helper.to_array(attr.t)
    return weights, constants


def extract_aux_files(
    constants: Mapping[str, np.ndarray],
    out_dir: str,
    horizon: int,
    constant_map: Optional[Mapping[str, str]] = None,
) -> Dict[str, str]:
    """Write the aux .npy files (reference models/onnx2torch.py:60-89)."""
    constant_map = dict(constant_map or DEFAULT_CONSTANT_MAP)
    os.makedirs(out_dir, exist_ok=True)
    written = {}
    for node_name, stem in constant_map.items():
        if node_name not in constants:
            continue
        name = f"constantMask{horizon}" if stem == "constantMask" else stem
        path = os.path.join(out_dir, f"{name}.npy")
        np.save(path, np.asarray(constants[node_name], dtype=np.float32))
        written[name] = path
    return written


def convert_onnx_checkpoint(
    cfg: ModelConfig,
    onnx_path: str,
    name_map_csv: str,
    out_params_npz: str,
    aux_out_dir: Optional[str] = None,
    horizon: int = 24,
) -> None:
    """Full conversion: .onnx -> params .npz + aux .npy files."""
    from pangu_tpu.interop.npz_io import save_params_npz

    weights, constants = read_onnx(onnx_path)
    name_map = load_name_map(name_map_csv)
    params = params_from_onnx_weights(cfg, weights, name_map)
    save_params_npz(out_params_npz, params)
    if aux_out_dir:
        extract_aux_files(constants, aux_out_dir, horizon)
