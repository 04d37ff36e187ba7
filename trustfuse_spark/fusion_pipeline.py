"""CLI mirroring the reference's batch entry point (fusion_pipeline.py):

    python -m trustfuse_spark.fusion_pipeline \
        --data /path/to/bucket.tsv --header Source,ISBN,Title,"Author list" \
        --entity-col ISBN --model crh --types types.json \
        [--gt gt.parquet] [--out triples_dir]

Loads a TSV claim table (or a parquet long table with --format long),
preprocesses, fuses, prints metrics when GT is given, optionally writes the
triples table.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--format", choices=["tsv", "long"], default="tsv")
    ap.add_argument("--header", default=None, help="comma-separated for tsv")
    ap.add_argument("--entity-col", default="Entity")
    ap.add_argument("--model", default="crh")
    ap.add_argument("--types", default=None, help="JSON file: attr -> type")
    ap.add_argument("--gt", default=None, help="parquet long GT table")
    ap.add_argument("--out", default=None, help="write triples parquet here")
    ap.add_argument("--max-itr", type=int, default=None)
    args = ap.parse_args(argv)

    from trustfuse_spark.api import ClaimsDataset
    from trustfuse_spark.session import get_spark

    spark = get_spark(app_name="trustfuse_fusion_pipeline")
    attr_types = {}
    if args.types:
        with open(args.types) as fh:
            attr_types = json.load(fh)

    if args.format == "tsv":
        if not args.header:
            raise SystemExit("--header required for tsv input")
        ds = ClaimsDataset.from_tsv(
            spark, args.data, [h.strip() for h in args.header.split(",")],
            args.entity_col, attr_types,
        )
    else:
        ds = ClaimsDataset.from_long(
            spark.read.parquet(args.data), attr_types=attr_types
        )
    if args.gt:
        ds.gt = spark.read.parquet(args.gt)
    ds = ds.preprocess()

    kwargs = {}
    if args.max_itr is not None:
        kwargs["max_itr"] = args.max_itr
    result = ds.fuse(args.model, **kwargs)
    triples = ds.triples(result)
    print(f"fused facts: {result.truth.count()}, triples: {triples.count()}")
    top = result.weights.orderBy("weight", ascending=False).limit(10).collect()
    print("top sources:", [(r["source"], round(r["weight"], 4)) for r in top])
    if args.gt:
        for row in ds.evaluate(result).collect():
            print(row.asDict())
    if args.out:
        triples.write.mode("overwrite").partitionBy("pred").parquet(args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
