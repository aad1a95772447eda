"""CLI entry points mirroring the reference programs (SURVEY §2.1 S6).

Reference CLIs → engine subcommands:

- ``HadoopWordCount <in> <out>``            → ``wordcount``
- ``HadoopWordPairs <in> <out>``            → ``wordpairs`` (m=1)
- ``HadoopWordPairs2 <in> <out> <m>``       → ``wordpairs -m M``
- ``HadoopWordStripes <in> <out>``          → ``wordstripes`` (m=1)
- ``HadoopWordStripes2 <in> <out> <m>``     → ``wordstripes -m M``
- ``SparkWordCount <in> <out> <out2>``      → ``topk`` (lowercase on,
  top-1000 per category, deterministic tie-break)

plus ``probe`` to run any declared probe and ``bench`` hints. Like the
reference's drivers (``HadoopWordCount.java:108,130-132``), each command
prints its wall-clock on completion.

Usage: ``python -m big_data_hadoop_spark.cli <command> ...``
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import functions as F


def _spark(app: str):
    from big_data_hadoop_spark.session import get_spark

    return get_spark(app_name=app)


def cmd_wordcount(args: argparse.Namespace) -> None:
    from big_data_hadoop_spark.operators.counts import token_counts
    from big_data_hadoop_spark.sources.io import (
        read_text_lines,
        write_partitioned_by_category,
    )

    spark = _spark("wordcount")
    lines = read_text_lines(spark, args.input)
    counts = token_counts(lines, lowercase=args.lowercase)
    write_partitioned_by_category(
        counts.orderBy("token").select("category", "token", "cnt"), args.output
    )


def cmd_wordpairs(args: argparse.Namespace) -> None:
    from big_data_hadoop_spark.operators.cooccur import pair_counts
    from big_data_hadoop_spark.sources.io import (
        read_text_lines,
        write_partitioned_by_category,
    )

    spark = _spark("wordpairs")
    lines = read_text_lines(spark, args.input)
    pairs = pair_counts(lines, m=args.m, lowercase=args.lowercase)
    out = pairs.select(
        "category",
        F.concat_ws(":", "left", "right").alias("pair"),
        "cnt",
    ).orderBy("pair")
    write_partitioned_by_category(out, args.output)


def cmd_wordstripes(args: argparse.Namespace) -> None:
    from big_data_hadoop_spark.operators.cooccur import stripe_entries, stripes
    from big_data_hadoop_spark.sources.io import (
        read_text_lines,
        write_partitioned_by_category,
    )

    spark = _spark("wordstripes")
    lines = read_text_lines(spark, args.input)
    st = stripe_entries(stripes(lines, m=args.m, lowercase=args.lowercase))
    out = st.select(
        "category", "token", F.concat_ws(",", "stripe").alias("stripe")
    ).orderBy("token")
    write_partitioned_by_category(out, args.output)


def cmd_topk(args: argparse.Namespace) -> None:
    from big_data_hadoop_spark.operators.counts import token_counts, top_k
    from big_data_hadoop_spark.sources.io import (
        read_text_lines,
        write_single_text_file,
    )

    spark = _spark("topk")
    lines = read_text_lines(spark, args.input)
    counts = token_counts(lines, lowercase=True)
    for category, out in ((args.words_category, args.output), ("number", args.output2)):
        if out is None:
            continue
        ranked = top_k(counts.filter(F.col("category") == category), args.k)
        write_single_text_file(ranked.select("token", "cnt"), out)


def cmd_probe(args: argparse.Namespace) -> None:
    from big_data_hadoop_spark.probes import QUERIES

    if args.name not in QUERIES:
        sys.exit(f"unknown probe {args.name!r}; choose from: {', '.join(QUERIES)}")
    spark = _spark(f"probe-{args.name}")
    df = QUERIES[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.rows, truncate=False)


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="big_data_hadoop_spark")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp, m_arg=False):
        sp.add_argument("input")
        sp.add_argument("output")
        sp.add_argument(
            "--lowercase", action="store_true", help="fold case before classifying"
        )
        if m_arg:
            sp.add_argument("-m", type=int, default=1, help="co-occurrence window")

    common(sub.add_parser("wordcount", help="token counts, category-partitioned"))
    common(sub.add_parser("wordpairs", help="co-occurrence pairs"), m_arg=True)
    common(sub.add_parser("wordstripes", help="co-occurrence stripes"), m_arg=True)

    tk = sub.add_parser("topk", help="top-K words and numbers (lowercased)")
    tk.add_argument("input")
    tk.add_argument("output", help="words output dir")
    tk.add_argument("output2", nargs="?", help="numbers output dir")
    tk.add_argument("-k", type=int, default=1000)
    tk.set_defaults(words_category="word")

    pr = sub.add_parser("probe", help="run a declared probe")
    pr.add_argument("name")
    pr.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pr.add_argument("--rows", type=int, default=20)
    pr.add_argument("--explain", action="store_true")

    args = p.parse_args(argv)
    t0 = time.monotonic()
    {
        "wordcount": cmd_wordcount,
        "wordpairs": cmd_wordpairs,
        "wordstripes": cmd_wordstripes,
        "topk": cmd_topk,
        "probe": cmd_probe,
    }[args.command](args)
    print(f"[{args.command}] completed in {time.monotonic() - t0:.2f}s")


if __name__ == "__main__":
    main()
