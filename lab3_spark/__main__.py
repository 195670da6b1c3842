"""Command-line interface.

Reference-compatible commands (the three lab binaries,
phoenixLab/README:15-39):

    python -m lab3_spark wordcount <textfile>        # ./wordCount <file>
    python -m lab3_spark topk      <textfile> <k>    # ./top50 <file> <k>
    python -m lab3_spark invert    <textfile>        # ./invert <file>

Engine commands:

    python -m lab3_spark list                        # catalog queries
    python -m lab3_spark run <query> [--sf-dir DIR] [--limit N]
    python -m lab3_spark explain <query> [--sf-dir DIR]   # physical plan
    python -m lab3_spark sql "SELECT ..." [--sf-dir DIR] [--limit N]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="lab3_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    for name in ("wordcount", "invert"):
        sp = sub.add_parser(name)
        sp.add_argument("file")
        sp.add_argument("--mode", default="idiomatic", choices=["idiomatic", "parity"])
    sp = sub.add_parser("topk")
    sp.add_argument("file")
    sp.add_argument("k", type=int, nargs="?", default=50)
    sp.add_argument("--mode", default="idiomatic", choices=["idiomatic", "parity"])

    sub.add_parser("list")
    sp = sub.add_parser("run")
    sp.add_argument("query")
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sp.add_argument("--limit", type=int, default=20)
    sp = sub.add_parser("explain")
    sp.add_argument("query")
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sp = sub.add_parser("sql")
    sp.add_argument("statement")
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sp.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)

    if args.cmd == "list":
        from lab3_spark.queries_catalog import ORACLES, QUERIES

        width = max(map(len, QUERIES))
        for name, fn in QUERIES.items():
            tag = "oracle   " if name in ORACLES else "rows-only"
            doc = (fn.__doc__ or "").strip().split("\n")[0]
            print(f"{name:<{width}}  [{tag}]  {doc}")
        return 0

    from lab3_spark.session import get_spark

    spark = get_spark("lab3_spark_cli")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    if args.cmd == "run":
        from lab3_spark.queries_catalog import QUERIES

        if args.query not in QUERIES:
            print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
            return 2
        df = QUERIES[args.query](spark, args.sf_dir)
        df.show(args.limit, truncate=False)
        print(f"{args.query} took: {time.time() - t0:.3f} seconds")
        return 0

    if args.cmd == "sql":
        # ad-hoc ANSI SQL over the same tables every catalog query
        # reads — Catalyst plans it like any DataFrame pipeline, so
        # pushdown/broadcast/AQE apply identically
        from lab3_spark.sources.tables import TABLES, load_table

        for t in TABLES:
            try:
                load_table(spark, args.sf_dir, t).createOrReplaceTempView(t)
            except Exception:
                pass  # a missing table only matters if the SQL uses it
        df = spark.sql(args.statement)
        df.show(args.limit, truncate=False)
        print(f"sql took: {time.time() - t0:.3f} seconds")
        return 0

    if args.cmd == "explain":
        from lab3_spark.plans.explain import count_exchanges, formatted_plan
        from lab3_spark.queries_catalog import QUERIES

        if args.query not in QUERIES:
            print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
            return 2
        df = QUERIES[args.query](spark, args.sf_dir)
        print(formatted_plan(df))
        print(f"shuffle exchanges: {count_exchanges(df)}")
        return 0

    # the three reference pipelines over a raw text file, printed in
    # the reference's own output format (sinks.py)
    from lab3_spark.operators.inverted_index import inverted_index
    from lab3_spark.operators.topk import top_k_words
    from lab3_spark.operators.wordcount import word_count
    from lab3_spark.sinks import render_inverted_index_text, render_keyval_text
    from lab3_spark.sources.text import read_text_lines

    lines = read_text_lines(spark, args.file)
    if args.cmd == "wordcount":
        out = render_keyval_text(word_count(lines, mode=args.mode))
    elif args.cmd == "topk":
        out = render_keyval_text(top_k_words(lines, k=args.k, mode=args.mode))
    else:
        idx = inverted_index(lines, id_col="line_no", stop_mode=args.mode)
        out = render_inverted_index_text(idx)
    for r in out.collect():
        print(r["line"])
    # the reference apps self-time (wordCount.cpp:138-164)
    print(f"The map reduction took: {time.time() - t0:.3f} seconds", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
