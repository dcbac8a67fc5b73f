"""Plot verb: distributed decimation + matplotlib-or-sparkline render."""

from svoe_spark.consumers.viz import plot_multi, sparkline


def test_sparkline_shape_and_nulls():
    s = sparkline([1.0, None, 2.0, 3.0, float("nan"), 8.0])
    assert len(s) == 6
    assert s[1] == " " and s[4] == " "
    assert s[0] == "▁" and s[5] == "█"
    assert sparkline([5.0, 5.0]) == "▁▁"
    assert sparkline([None]) == " "


def test_plot_multi_decimates_and_renders(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(base + dt.timedelta(seconds=i), float(i % 17), i) for i in range(5000)],
        "ts timestamp, a double, b long",
    )
    out = plot_multi(df, max_points=100)
    assert isinstance(out, str)
    if out.endswith(".png"):  # matplotlib present
        import os

        assert os.path.exists(out)
        os.remove(out)
    else:  # text fallback: header + one line per numeric column
        lines = out.splitlines()
        assert "5000 rows" in lines[0] and "50th" in lines[0]
        assert len(lines) == 3
        assert lines[1].lstrip().startswith("a ") or " a " in lines[1]
