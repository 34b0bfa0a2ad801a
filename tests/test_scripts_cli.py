"""End-to-end CLI smokes of the main entry points (reference
finetune/finetune_fully.py __main__, inference/test_main.py __main__,
inference/inference_*.py __main__): tiny geometry, synthetic store,
short date ranges — catches argument-plumbing regressions the
engine-level tests can't see."""

import importlib.util
import os
import sys

import jax
import numpy as np
import pytest


def _run_script(name, argv, monkeypatch):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        f"{name}_cli_smoke", os.path.join(root, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", [f"{name}.py"] + argv)
    mod.main()


_TINY_DATES = [
    "--set", "data.train_start=20180101 00:00:00",
    "--set", "data.train_end=20180105 00:00:00",
    "--set", "data.val_start=20180105 00:00:00",
    "--set", "data.val_end=20180108 00:00:00",
    "--set", "data.test_start=20180108 00:00:00",
    "--set", "data.test_end=20180111 00:00:00",
]


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from pangu_tpu.aux import synthetic_aux_constants
    from pangu_tpu.config import pangu_tiny
    from pangu_tpu.interop.npz_io import save_params_npz
    from pangu_tpu.model import PanguModel

    cfg = pangu_tiny()
    m = cfg.model
    aux = synthetic_aux_constants(m, cfg.train)
    model = PanguModel(m)
    u = np.zeros((1, m.upper_vars, m.levels, m.lat, m.lon), np.float32)
    s = np.zeros((1, m.surface_vars, m.lat, m.lon), np.float32)
    params = model.init(jax.random.PRNGKey(5), u, s, aux)
    path = tmp_path_factory.mktemp("ckpt") / "tiny.npz"
    save_params_npz(str(path), params)
    return str(path)


def test_finetune_cli_smoke(tmp_path, monkeypatch, tiny_ckpt):
    out = tmp_path / "run"
    _run_script("finetune", [
        "--preset", "tiny", "--out", str(out), "--weights", tiny_ckpt,
        "--set", "train.epochs=1", "--set", "train.batch_size=1",
        "--set", "train.save_interval=1", *_TINY_DATES,
    ], monkeypatch)
    run_dir = out / "finetune_fully" / "24"
    assert (run_dir / "finetune.log").exists()
    # the post-fit test pass writes the score CSV families
    csvs = list(run_dir.rglob("*.csv"))
    assert csvs, "finetune's final evaluate() wrote no score CSVs"


def test_test_cli_smoke(tmp_path, monkeypatch, tiny_ckpt):
    out = tmp_path / "run"
    _run_script("test", [
        "--preset", "tiny", "--out", str(out), "--weights", tiny_ckpt,
        *_TINY_DATES,
    ], monkeypatch)
    csvs = list(out.rglob("*.csv"))
    assert csvs, "test CLI wrote no score CSVs"


def test_rollout_cli_smoke(tmp_path, monkeypatch, tiny_ckpt):
    out = tmp_path / "run"
    _run_script("rollout", [
        "--preset", "tiny", "--out", str(out), "--weights", tiny_ckpt,
        "--mode", "single", *_TINY_DATES,
    ], monkeypatch)
    assert list(out.rglob("*.csv")), "rollout CLI wrote no score CSVs"


def test_rollout_base_horizon_weights_used(tmp_path, monkeypatch, tiny_ckpt):
    """--weights-24 naming the BASE horizon (24, with no --weights) must
    load that checkpoint for the 24h rung — before the round-4 scripts
    review fix the `h not in bundles` guard skipped it and the ladder
    scored a randomly initialized base bundle."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "rollout_cli_reg", os.path.join(root, "scripts", "rollout.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    calls = []
    real_bundle_for = mod._bundle_for

    def recording_bundle_for(cfg, args, aux, horizon, weights):
        bundle = real_bundle_for(cfg, args, aux, horizon, weights)
        calls.append((horizon, weights, bundle))
        return bundle

    captured = {}
    monkeypatch.setattr(mod, "_bundle_for", recording_bundle_for)
    monkeypatch.setattr(
        mod, "multi_output_rollout",
        lambda bundles, *a, **k: captured.update(bundles=bundles))
    monkeypatch.setattr(sys, "argv", [
        "rollout.py", "--preset", "tiny", "--out", str(tmp_path),
        "--mode", "multi", "--weights-24", tiny_ckpt, "--lead-days", "1",
        *_TINY_DATES,
    ])
    mod.main()

    loaded = [b for h, w, b in calls if h == 24 and w == tiny_ckpt]
    assert loaded, (
        "the 24h rung never loaded --weights-24 "
        f"(calls: {[(h, w) for h, w, _ in calls]})")
    # and the bundle handed to the rollout is the checkpoint-loaded one,
    # not the weightless base
    assert captured["bundles"][24] is loaded[0], (
        "rollout still uses the randomly initialized base bundle")


def test_reproduce_baseline_dry_run(tmp_path):
    """The acceptance pipeline's wiring stays runnable: synthetic-ONNX
    weights -> convert -> .pt ETL -> npy store -> test() scoring -> verdict
    parse, all through the REAL shell script (VERDICT r03 #10 — the day
    network/data appear, the real run is one command)."""
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(root, ".jax_cache"))
    res = subprocess.run(
        ["bash", "scripts/reproduce_baseline.sh", "--dry-run",
         str(tmp_path / "work")],
        cwd=root, env=env, capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    assert "dry-run OK" in res.stdout


def test_launch_cloud_dry_run(capsys):
    """Cloud orchestration plan (reference sagemaker/{fsx,fastfile}.ipynb +
    code/start.py roles): `all` must provision, stage code+data, and launch
    the entry on every worker — verified offline via --dry-run."""
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "launch_cloud_cli_smoke", os.path.join(root, "scripts", "launch_cloud.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rc = mod.main(["all", "--tpu-name", "pangu-ft", "--zone", "us-central2-b",
                   "--accelerator-type", "v5litepod-16",
                   "--data-bucket", "gs://era5/npy", "--entry", "finetune",
                   "--dry-run", "--", "--set", "train.epochs=2"])
    assert rc == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("+ ")]
    # provision -> tar -> scp -> unpack -> data rsync -> run = 6 steps
    assert len(lines) == 6, out
    assert "tpu-vm create pangu-ft" in lines[0]
    assert "--accelerator-type=v5litepod-16" in lines[0]
    assert "tar" in lines[1] and "scp" in lines[2]
    assert "--worker=all" in lines[2] and "--worker=all" in lines[3]
    assert "gsutil -m rsync -r gs://era5/npy" in lines[4]
    assert "launch_pod.sh finetune" in lines[5]
    # data.root is auto-pointed at the staged copy; user args pass through
    assert "data.root=" in lines[5] and "train.epochs=2" in lines[5]

    # FastFile analogue: stream mode mounts gcsfuse instead of copying
    rc = mod.main(["stage", "--tpu-name", "pangu-ft",
                   "--data-bucket", "gs://era5/npy", "--data-mode", "stream",
                   "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "gcsfuse" in out and "--only-dir npy era5" in out, out
    assert "rsync" not in out

    # queued-resources path (spot provisioning) + teardown
    rc = mod.main(["delete", "--tpu-name", "pangu-ft", "--queued", "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "queued-resources delete pangu-ft" in out.replace("'", "")
