"""Interactive forecast viewer (reference demo/app.py: a Streamlit app over
simulated forecasts; reference demo/app.py:150,165-166 notes its data is
simulated too).

Run with streamlit when available:
    streamlit run demo/app.py
Headless fallback (no streamlit): renders the same forecast panels to a
static HTML report:
    python demo/app.py --out demo_report
"""

from __future__ import annotations

import argparse
import base64
import io
import os
import sys
from datetime import datetime, timedelta

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pangu_tpu.config import (
    ERA5_SURFACE_VARIABLES,
    ERA5_UPPER_LEVELS,
    ERA5_UPPER_VARIABLES,
    pangu_tiny,
)
from pangu_tpu.aux import synthetic_aux_constants
from pangu_tpu.data import SyntheticStore


def _forecast(init_time: datetime, steps: int):
    """Tiny-geometry synthetic forecast (the reference demo also runs on
    simulated data); swap in a real checkpoint via pangu_tpu.cli for
    production use."""
    import jax

    from pangu_tpu.model import PanguModel
    from pangu_tpu.rollout.autoregressive import make_forecast_step

    cfg = pangu_tiny()
    aux = synthetic_aux_constants(cfg.model, cfg.train)
    store = SyntheticStore(cfg.model)
    model = PanguModel(cfg.model)
    upper, surface = store.load(init_time)
    upper, surface = upper[None], surface[None]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), upper, surface, aux)
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


def run_streamlit() -> None:
    import streamlit as st

    st.set_page_config(page_title="Pangu-Weather TPU Demo", layout="wide")
    st.title("Pangu-Weather TPU Forecast Demo")
    st.caption("Autoregressive forecasts on the tiny demo geometry "
               "(synthetic weather; wire a checkpoint for real forecasts).")

    init = st.sidebar.date_input("Init date", datetime(2024, 1, 1))
    steps = st.sidebar.slider("Forecast steps (x24h)", 1, 10, 3)
    var = st.sidebar.selectbox("Surface variable", list(ERA5_SURFACE_VARIABLES))

    cfg, frames = _forecast(datetime(init.year, init.month, init.day), steps)
    vi = list(ERA5_SURFACE_VARIABLES).index(var)
    cols = st.columns(min(3, steps))
    for i, (u, s) in enumerate(frames):
        with cols[i % len(cols)]:
            st.pyplot(_render_field(s[vi], f"{var} +{24 * (i + 1)}h"))


def run_headless(out_dir: str, steps: int) -> str:
    os.makedirs(out_dir, exist_ok=True)
    cfg, frames = _forecast(datetime(2024, 1, 1), steps)
    imgs = []
    for i, (u, s) in enumerate(frames):
        for vi, var in enumerate(ERA5_SURFACE_VARIABLES[: cfg.model.surface_vars]):
            fig = _render_field(s[vi], f"{var} +{24 * (i + 1)}h")
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

    if in_streamlit:
        run_streamlit()
        return

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="demo_report")
    p.add_argument("--steps", type=int, default=2)
    args = p.parse_args()
    path = run_headless(args.out, args.steps)
    print(f"wrote {path}")


main() if __name__ == "__main__" else None
