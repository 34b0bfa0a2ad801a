"""Interactive forecast viewer (reference demo/app.py: a Streamlit app over
simulated forecasts; reference demo/app.py:150,165-166 notes its data is
simulated too).

Unlike the reference's demo, this one can also drive REAL checkpoints and
data through the same flags every other entry point uses (pangu_tpu.cli):

    # synthetic tiny-geometry demo (default, matches the reference's demo)
    streamlit run demo/app.py
    python demo/app.py --out demo_report

    # real weights + real normalization constants + real ERA5 .npy frames
    streamlit run demo/app.py -- --preset pretrain \
        --weights ckpt.npz --aux-dir aux/ --set data.root=/data/era5
    python demo/app.py --preset pretrain --weights ckpt.npz --aux-dir aux/ \
        --set data.root=/data/era5 --out demo_report

Headless fallback (no streamlit) renders the same forecast panels to a
static HTML report.
"""

from __future__ import annotations

import base64
import io
import os
import sys
from datetime import datetime

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pangu_tpu.config import ERA5_SURFACE_VARIABLES
from pangu_tpu.cli import base_parser, build_config, load_model_and_params


def _parse_args(lenient: bool):
    p = base_parser("Pangu-Weather TPU forecast demo")
    p.add_argument("--steps", type=int, default=2,
                   help="autoregressive steps (x horizon hours) to render")
    p.add_argument("--init", type=str, default="2024010100",
                   help="init time YYYYMMDDHH (headless mode)")
    # the demo defaults to the tiny geometry — the full pretrained model is
    # what scripts/rollout.py is for; pass --preset pretrain to override
    p.set_defaults(preset="tiny")
    if lenient:
        # under streamlit, argv may carry flags streamlit itself injects;
        # headless keeps argparse's strict unknown-flag rejection
        args, _ = p.parse_known_args()
        return args
    return p.parse_args()


def _forecast(init_time: datetime, steps: int, args):
    """Autoregressive forecast via the same wiring as scripts/rollout.py:
    real store/aux/weights when configured, synthetic otherwise (the
    reference demo only has the synthetic mode)."""
    from pangu_tpu.aux import load_aux_constants
    from pangu_tpu.data.dataset import make_store
    from pangu_tpu.rollout.autoregressive import make_forecast_step

    cfg = build_config(args)
    aux = load_aux_constants(cfg.model, cfg.train, args.aux_dir, cfg.horizon)
    store = make_store(cfg.data, cfg.model)
    model, params = load_model_and_params(cfg, args, aux)
    upper, surface = store.load(init_time)
    upper, surface = upper[None], surface[None]
    step = make_forecast_step(model, donate=False)
    frames = []
    u, s = upper, surface
    for i in range(steps):
        u, s = step(params, u, s, aux)
        frames.append((np.asarray(u)[0], np.asarray(s)[0]))
    return cfg, frames


def _render_field(field: np.ndarray, title: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 3))
    im = ax.imshow(field, cmap="RdBu_r")
    ax.set_title(title)
    ax.axis("off")
    fig.colorbar(im, ax=ax, fraction=0.04)
    fig.tight_layout()
    return fig


def run_streamlit(args) -> None:
    import streamlit as st

    st.set_page_config(page_title="Pangu-Weather TPU Demo", layout="wide")
    st.title("Pangu-Weather TPU Forecast Demo")
    source = "real checkpoint" if args.weights else "synthetic weather"
    st.caption(f"Autoregressive forecasts ({source}; pass --weights/"
               "--aux-dir/--set data.root=... after `--` for real runs).")

    init = st.sidebar.date_input("Init date", datetime(2024, 1, 1))
    steps = st.sidebar.slider("Forecast steps", 1, 10,
                              max(1, min(args.steps, 10)))

    cfg, frames = _forecast(
        datetime(init.year, init.month, init.day), steps, args
    )
    # a config override may carry fewer surface variables than ERA5's 4
    names = list(ERA5_SURFACE_VARIABLES[: cfg.model.surface_vars])
    var = st.sidebar.selectbox("Surface variable", names)
    vi = names.index(var)
    cols = st.columns(min(3, steps))
    import matplotlib.pyplot as plt

    for i, (u, s) in enumerate(frames):
        with cols[i % len(cols)]:
            fig = _render_field(s[vi], f"{var} +{cfg.horizon * (i + 1)}h")
            st.pyplot(fig)
            # streamlit reruns the whole script per widget interaction;
            # unclosed pyplot-registered figures accumulate across reruns
            plt.close(fig)


def run_headless(out_dir: str, args) -> str:
    os.makedirs(out_dir, exist_ok=True)
    init = datetime.strptime(args.init, "%Y%m%d%H")
    cfg, frames = _forecast(init, args.steps, args)
    imgs = []
    for i, (u, s) in enumerate(frames):
        for vi, var in enumerate(ERA5_SURFACE_VARIABLES[: cfg.model.surface_vars]):
            fig = _render_field(s[vi], f"{var} +{cfg.horizon * (i + 1)}h")
            buf = io.BytesIO()
            fig.savefig(buf, format="png", dpi=80)
            imgs.append(base64.b64encode(buf.getvalue()).decode())
            import matplotlib.pyplot as plt

            plt.close(fig)
    html = "<html><body><h1>Pangu-Weather TPU Forecast Demo</h1>"
    html += "".join(f'<img src="data:image/png;base64,{b}"/>' for b in imgs)
    html += "</body></html>"
    path = os.path.join(out_dir, "index.html")
    with open(path, "w") as f:
        f.write(html)
    return path


def main() -> None:
    try:
        import streamlit  # noqa: F401

        in_streamlit = streamlit.runtime.exists()
    except Exception:
        in_streamlit = False

    args = _parse_args(lenient=in_streamlit)
    if in_streamlit:
        run_streamlit(args)
        return

    path = run_headless(args.out or "demo_report", args)
    print(f"wrote {path}")


main() if __name__ == "__main__" else None
