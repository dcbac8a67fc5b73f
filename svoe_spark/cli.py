"""CLI — the reference's command surface (reference: svoe/cli/
featurizer_cli.py:16-39, trainer_cli.py, backtester_cli.py:14-30):

    python -m svoe_spark.cli featurizer run <config.yaml> [--out PATH]
    python -m svoe_spark.cli featurizer get-data <config.yaml> [--every-nth N]
    python -m svoe_spark.cli featurizer plot <config.yaml> [--cols A B] [--out f.png]
    python -m svoe_spark.cli backtester run <config.yaml> --price-col COL
    python -m svoe_spark.cli trainer run <config.yaml> --features A B --label L
    python -m svoe_spark.cli serve [--host H] [--port P]
    python -m svoe_spark.cli bench
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from svoe_spark.session import get_spark

    s = get_spark("svoe_spark_cli")
    s.sparkContext.setLogLevel("ERROR")
    return s


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="svoe_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    feat = sub.add_parser("featurizer")
    fsub = feat.add_subparsers(dest="action", required=True)
    for action in ("run", "get-data", "plot"):
        fp = fsub.add_parser(action)
        fp.add_argument("config")
        fp.add_argument("--out", help="write result parquet (run/get-data) or image (plot) here")
        fp.add_argument("--every-nth", type=int, default=1)
        fp.add_argument("--show", type=int, default=10)
        if action == "plot":
            fp.add_argument("--cols", nargs="*", help="columns to plot (default: numeric)")
            fp.add_argument("--same-fig", action="store_true")

    bt = sub.add_parser("backtester")
    btsub = bt.add_subparsers(dest="action", required=True)
    btr = btsub.add_parser("run")
    btr.add_argument("config")
    btr.add_argument("--price-col", required=True)
    btr.add_argument("--key", default="symbol")
    btr.add_argument("--splits", type=int, default=1)

    tr = sub.add_parser("trainer")
    trsub = tr.add_subparsers(dest="action", required=True)
    for action in ("run", "best-model", "predictions"):
        trr = trsub.add_parser(action)
        trr.add_argument("config")
        trr.add_argument("--features", nargs="+", required=True)
        trr.add_argument("--label", required=True)
        trr.add_argument("--kind", default="linear", choices=["linear", "gbt"])
        if action == "predictions":
            trr.add_argument("--out", help="write predictions parquet here")
            trr.add_argument("--show", type=int, default=10)

    srv = sub.add_parser("serve")
    srv.add_argument("--host", default="127.0.0.1")
    srv.add_argument("--port", type=int, default=1228)
    srv.add_argument(
        "--token",
        default=None,
        help="required when binding beyond localhost: POST endpoints "
        "execute uploaded definitions; clients send X-Api-Token",
    )

    sub.add_parser("bench")

    args = p.parse_args(argv)

    if args.cmd == "bench":
        import bench

        bench.main()
        return 0

    spark = _spark()
    from svoe_spark.plans.featurizer import Featurizer

    if args.cmd == "serve":
        from svoe_spark.api.rest import serve

        server = serve(spark, host=args.host, port=args.port, token=args.token)
        print(json.dumps({"serving": f"http://{args.host}:{server.server_address[1]}"}))
        try:
            import threading

            threading.Event().wait()  # serve until interrupted
        except KeyboardInterrupt:
            server.shutdown()
        return 0

    if args.cmd == "featurizer":
        fz = Featurizer(spark)
        df = fz.get_materialized_data(args.config, pick_every_nth_row=args.every_nth)
        if args.action == "plot":
            from svoe_spark.consumers.viz import plot_multi

            res = plot_multi(
                df,
                col_names=args.cols or None,
                same_fig=args.same_fig,
                out=args.out,
            )
            print(res)
            return 0
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            print(json.dumps({"written": args.out, "rows": spark.read.parquet(args.out).count()}))
        else:
            df.show(args.show, truncate=False)
            print(json.dumps({"rows": df.count()}))
        return 0

    if args.cmd == "backtester":
        from svoe_spark.consumers.backtest import run_backtest, run_backtest_time_split

        fls = Featurizer(spark).run(args.config)
        if args.splits > 1:
            res = run_backtest_time_split(
                fls, price_col=args.price_col, n_splits=args.splits, by=args.key
            )
        else:
            res = run_backtest(fls, price_col=args.price_col, by=args.key)
        rows = [r.asDict() for r in res.collect()]
        print(json.dumps(rows, default=str))
        return 0

    if args.cmd == "trainer":
        from svoe_spark.consumers.trainer import (
            best_model,
            r2,
            score,
            time_split,
            train_regressor,
        )

        fls = Featurizer(spark).run(args.config)
        # every downstream action (quantile split, fit, evaluate,
        # counts) re-executes the full featurize pipeline otherwise —
        # persist once, release at the end
        fls = fls.persist()
        train, valid, test = time_split(fls)
        clean_test = test.na.drop(subset=args.features + [args.label])
        if args.action == "best-model":
            model, info = best_model(
                train, valid, args.features, args.label, kind=args.kind
            )
            info["r2_test"] = r2(score(model, clean_test), args.label)
            print(json.dumps(info))
            fls.unpersist()
            return 0
        model = train_regressor(train, args.features, args.label, kind=args.kind)
        scored = score(model, clean_test)
        if args.action == "predictions":
            out_cols = ["ts", args.label, "prediction"]
            preds = scored.select(*[c for c in out_cols if c in scored.columns])
            if args.out:
                preds.write.mode("overwrite").parquet(args.out)
                # count from the written files — not a second featurize+score
                n = spark.read.parquet(args.out).count()
                print(json.dumps({"written": args.out, "rows": n}))
            else:
                # two actions (show + count) share the pipeline via persist
                preds.persist()
                preds.show(args.show, truncate=False)
                print(json.dumps({"rows": preds.count()}))
                preds.unpersist()
            fls.unpersist()
            return 0
        print(json.dumps({"r2_test": r2(scored, args.label), "n_train": train.count(),
                          "n_test": test.count()}))
        fls.unpersist()
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
