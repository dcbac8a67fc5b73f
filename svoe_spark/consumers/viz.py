"""Plot verb (reference featurizer_cli.py:28-33 `plot` ->
common/pandas/df_utils.py:108-128 plot_multi: one matplotlib axis per
feature column over timestamp).

Spark-first concerns first: the DataFrame is DECIMATED distributedly
(every-nth in event-time order) before anything reaches the driver, so
plotting a 100 TB feature set collects at most ``max_points`` rows.
Rendering is matplotlib when importable (written to a file — a driver
box has no display); otherwise a deterministic unicode-sparkline text
fallback, so the verb works in this dependency-free environment too."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOCKS = "▁▂▃▄▅▆▇█"


def sparkline(values: list[float | None], width: int = 60) -> str:
    """Unicode sparkline; NaN/None render as spaces."""
    vals = [
        None if v is None or (isinstance(v, float) and math.isnan(v)) else float(v)
        for v in values
    ]
    if len(vals) > width:  # uniform thinning to terminal width
        step = len(vals) / width
        vals = [vals[int(i * step)] for i in range(width)]
    present = [v for v in vals if v is not None]
    if not present:
        return " " * len(vals)
    lo, hi = min(present), max(present)
    span = hi - lo
    out = []
    for v in vals:
        if v is None:
            out.append(" ")
        elif span == 0:
            out.append(BLOCKS[0])
        else:
            out.append(BLOCKS[min(7, int((v - lo) / span * 8))])
    return "".join(out)


def plot_multi(
    df: DataFrame,
    col_names: list[str] | None = None,
    ts_col: str = "ts",
    same_fig: bool = False,
    out: str | None = None,
    max_points: int = 2000,
) -> str:
    """Plot each numeric column against event time.

    Returns the written image path (matplotlib available) or the text
    rendering (fallback — also what the CLI prints). Mirrors the
    reference's column selection: all columns minus the timestamp(s)."""
    if col_names is None:
        col_names = [
            c
            for c, t in df.dtypes
            if c != ts_col
            and t in ("double", "float", "int", "bigint", "smallint", "tinyint")
        ]
    if not col_names:
        raise ValueError("no numeric columns to plot")

    n_rows = df.count()
    nth = max(1, math.ceil(n_rows / max_points))
    # decimate with a deterministic hash-mod filter, NOT every_nth with
    # no keys: a global event-time rank is a single-task window — the
    # exact anti-pattern the curation module exists to avoid. Hash
    # selection keeps ~n/nth rows, is partition-parallel, and is a pure
    # function of the timestamp (rerun-stable); for a plot, hash-uniform
    # thinning is indistinguishable from exact every-nth.
    sel = df.select(ts_col, *col_names)
    if nth > 1:
        sel = sel.filter(F.pmod(F.xxhash64(F.col(ts_col)), F.lit(nth)) == 0)
    pdf = sel.orderBy(ts_col).toPandas()

    try:
        import matplotlib

        matplotlib.use("Agg")  # driver boxes have no display
        import matplotlib.pyplot as plt

        have_mpl = True
    except ImportError:
        have_mpl = False

    if have_mpl:
        out = out or "plot.png"
        if same_fig or len(col_names) == 1:
            ax = pdf.plot(x=ts_col, y=col_names)
            fig = ax.get_figure()
        else:
            fig, axes = plt.subplots(nrows=len(col_names), ncols=1, sharex=True)
            for i, c in enumerate(col_names):
                pdf.plot(x=ts_col, y=c, ax=axes[i])
        fig.savefig(out)
        plt.close(fig)
        return out

    lines = [
        f"{c:>24}  {sparkline(list(pdf[c]))}  "
        f"[{pdf[c].min():.6g} .. {pdf[c].max():.6g}]"
        for c in col_names
    ]
    header = (
        f"{n_rows} rows, every {nth}th plotted "
        f"({pdf[ts_col].min()} .. {pdf[ts_col].max()})"
    )
    return "\n".join([header, *lines])
