"""Interop roundtrips, ONNX mapping logic (with fake graphs), aux tools,
stats tool, and the CLI config bootstrap."""

import os
import subprocess
import sys
from datetime import datetime

import numpy as np
import pytest

import jax

from pangu_tpu.aux import build_region_mask, synthetic_aux_constants
from pangu_tpu.config import ModelConfig, pangu_tiny
from pangu_tpu.data.dataset import Era5Dataset, SyntheticStore
from pangu_tpu.data.stats import analyze_dataset, compute_normalization_stats
from pangu_tpu.interop.npz_io import load_params_npz, save_params_npz
from pangu_tpu.interop.onnx_import import (
    extract_aux_files,
    params_from_onnx_weights,
)
from pangu_tpu.interop.torch_import import (
    params_from_state_dict,
    reference_key_map,
    state_dict_from_params,
)
from pangu_tpu.model import PanguModel


@pytest.fixture(scope="module")
def tiny_params():
    cfg = pangu_tiny()
    m = cfg.model
    aux = synthetic_aux_constants(m, cfg.train)
    model = PanguModel(m)
    u = np.zeros((1, m.upper_vars, m.levels, m.lat, m.lon), np.float32)
    s = np.zeros((1, m.surface_vars, m.lat, m.lon), np.float32)
    params = model.init(jax.random.PRNGKey(0), u, s, aux)
    return m, params


def test_key_map_covers_all_kernels(tiny_params):
    m, params = tiny_params
    mapped_paths = {("params",) + p for _, p, _ in reference_key_map(m)}
    # every param leaf must be reachable from the reference mapping
    flat = []

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        else:
            flat.append(path)

    walk(params, ())
    for p in flat:
        assert p in mapped_paths, f"param {p} missing from reference key map"
    assert len(mapped_paths) == len(flat)


def test_torch_format_roundtrip(tiny_params):
    m, params = tiny_params
    sd = state_dict_from_params(m, params)
    p2 = params_from_state_dict(m, sd)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_npz_roundtrip(tiny_params, tmp_path):
    m, params = tiny_params
    path = str(tmp_path / "p.npz")
    save_params_npz(path, params)
    p2 = load_params_npz(path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_onnx_mapping_with_fake_graph(tiny_params):
    """Feed an {onnx_name: array} dict derived from a known param tree and
    check the importer reconstructs it (ONNX linear layout == ours)."""
    m, params = tiny_params
    sd = state_dict_from_params(m, params)
    name_map = {k: f"fake::{i}" for i, k in enumerate(sd)}
    onnx_weights = {}
    for k, v in sd.items():
        # emulate ONNX layouts: 2-D weights transposed vs torch, rest equal
        onnx_weights[name_map[k]] = v.T if v.ndim == 2 else v
    p2 = params_from_onnx_weights(m, onnx_weights, name_map)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    with pytest.raises(KeyError):
        params_from_onnx_weights(m, {}, name_map)


def test_extract_aux_files(tmp_path):
    constants = {
        "/b1/Constant_9": np.ones((13, 1, 1, 5), np.float32),
        "/b1/Constant_44": np.zeros((1, 3, 724, 1440), np.float32),
        "/b1/Constant_17": np.zeros((1, 1, 1, 13, 721, 1440), np.float32),
    }
    written = extract_aux_files(constants, str(tmp_path), horizon=24)
    assert set(written) == {"upper_mean", "constantMask24", "Constant_17_output_0"}
    assert np.load(tmp_path / "upper_mean.npy").shape == (13, 1, 1, 5)


def test_region_mask():
    mask = build_region_mask((34, 49), (73, 96))
    assert mask.shape == (721, 1440)
    # 40N, 80E inside; 0N outside
    row_40n = int((90 - 40) / 0.25)
    col_80e = int(80 / 0.25)
    assert mask[row_40n, col_80e] == 1.0
    assert mask[int(90 / 0.25), col_80e] == 0.0
    assert 0 < mask.sum() < mask.size


def test_stats_tool(tmp_path):
    cfg = pangu_tiny()
    ds = Era5Dataset(SyntheticStore(cfg.model), "20180101", "20180110", "24h", 24)
    out = analyze_dataset(ds, str(tmp_path), "unit", limit=3)
    text = open(out).read()
    assert "Surface wind speed" in text and "p99" in text

    sm, ss, um, us = compute_normalization_stats(ds, limit=3)
    assert sm.shape == (1, cfg.model.surface_vars, 1, 1)
    assert um.shape == (1, cfg.model.upper_vars, cfg.model.levels, 1, 1)
    assert (us > 0).all() and (ss > 0).all()


def test_cli_config_bootstrap():
    from pangu_tpu.cli import base_parser, build_config

    p = base_parser("t")
    args = p.parse_args(["--preset", "tiny", "--horizon", "6",
                         "--set", "train.lr=1e-4"])
    cfg = build_config(args)
    assert cfg.horizon == 6
    assert cfg.train.lr == 1e-4
