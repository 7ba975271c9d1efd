"""CLI mirroring the reference's script surface (read_parquet.py,
calc_summary.py, sync_documents.py, get_documents.py, clean_place.py):

    python -m datalake_etlscripts_spark ingest   --incoming B.parquet --state S --fields title,cpv
    python -m datalake_etlscripts_spark summary  --table T.parquet --fields f1,f2
    python -m datalake_etlscripts_spark sync     --src A.parquet --dst B.parquet [--check-only]
    python -m datalake_etlscripts_spark compact  --state S --out OUT
    python -m datalake_etlscripts_spark check    --state S
    python -m datalake_etlscripts_spark purge    --listing L.parquet --state S --dry-run
    python -m datalake_etlscripts_spark crawl    --state S --fields f1,f2 [--plan-only]
    python -m datalake_etlscripts_spark enrich   --state S --annotations A.jsonl [--dry-run]
    python -m datalake_etlscripts_spark optimize --table T --out OUT --zorder-by c1,c2

Each subcommand is a thin argparse wrapper over the library — the
same DataFrame plans the driver queries use.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="datalake_etlscripts_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("ingest", help="versioned merge of a batch into the store")
    p.add_argument("--incoming", required=True)
    p.add_argument("--state", required=True)
    p.add_argument("--fields", required=True, help="comma-separated business fields")
    p.add_argument("--group", default="contracts", choices=["contracts", "minors"])
    p.add_argument("--drop", action="store_true", help="start from an empty store")

    p = sub.add_parser("summary", help="group-by count summaries (calc_summary)")
    p.add_argument("--table", required=True)
    p.add_argument("--fields", required=True)

    p = sub.add_parser("sync", help="storage reconciliation plan (sync_documents)")
    p.add_argument("--src", default=None, help="parquet listing of the source")
    p.add_argument("--dst", default=None, help="parquet listing of the destination")
    p.add_argument(
        "--src-dir", default=None,
        help="source store (real files): bare path = disk, URI "
        "(file://, s3://, ...) = pyarrow.fs object store",
    )
    p.add_argument(
        "--dst-dir", default=None,
        help="destination store: bare path or URI, like --src-dir",
    )
    p.add_argument("--name-col", default="file_name")
    p.add_argument("--content-cols", default="")
    p.add_argument("--check-only", action="store_true")
    p.add_argument("--patch-list", default=None, help="write the plan as text here")

    p = sub.add_parser("compact", help="current-versions view (clean_place)")
    p.add_argument("--state", required=True)
    p.add_argument("--out", required=True)

    p = sub.add_parser("check", help="store invariants (checking/*)")
    p.add_argument("--state", required=True)

    p = sub.add_parser("purge", help="backup-then-delete plan for obsolete versions' files (purge_documents)")
    p.add_argument("--listing", default=None, help="parquet with the file listing")
    p.add_argument("--state", required=True, help="parquet versioned store")
    p.add_argument(
        "--storage-dir", default=None,
        help="store to purge (real files): bare path = disk, URI = "
        "pyarrow.fs object store",
    )
    p.add_argument(
        "--backup-dir", default=None,
        help="backup target for purged files: bare path or URI",
    )
    p.add_argument("--name-col", default="file_name")
    p.add_argument("--dry-run", action="store_true")

    p = sub.add_parser("crawl", help="URL extract → prune → fetch plan (get_documents)")
    p.add_argument("--state", required=True, help="parquet store to scan for URLs")
    p.add_argument("--fields", required=True, help="comma-separated columns to scan")
    p.add_argument("--skip-servers", default="", help="comma-separated hosts to skip")
    p.add_argument("--out", default=None, help="write fetch results parquet here")
    p.add_argument(
        "--storage-dir", default=None,
        help="DISK store for fetched bodies ('{ntp_id}_{field}.{ext}' files)",
    )
    p.add_argument(
        "--plan-only", action="store_true",
        help="print the pruned URL plan without fetching (this container has no "
        "network; without --plan-only the deterministic offline fetcher runs)",
    )

    p = sub.add_parser(
        "enrich",
        help="company-annotation enrichment onto the store (parse_bsc_companies)",
    )
    p.add_argument("--state", required=True, help="parquet versioned store")
    p.add_argument("--annotations", required=True, help="JSONL company annotations")
    p.add_argument("--out", default=None, help="write the enriched store parquet here")
    p.add_argument(
        "--dry-run", action="store_true",
        help="report resolve/redirect/unknown tallies without writing (reference "
        "parse_bsc_companies.py --dry_run)",
    )

    p = sub.add_parser("export", help="write deterministic training shards (JSONL/parquet)")
    p.add_argument("--table", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--rows-per-shard", type=int, default=100_000)
    p.add_argument("--shard-key", default=None)
    p.add_argument("--format", default="json", choices=["json", "parquet"])

    p = sub.add_parser("explain", help="print a registered query's physical plan")
    p.add_argument("query", help="name from __spark_entry__.queries()")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--mode", default="formatted",
                   choices=["formatted", "extended", "simple", "cost", "codegen"])

    p = sub.add_parser("dedup", help="corpus dedup: pairs/clusters/keep-list to parquet")
    p.add_argument("--table", required=True, help="parquet corpus with id/text columns")
    p.add_argument("--out", required=True, help="output directory (parquet)")
    p.add_argument(
        "--strategy",
        default="minhash",
        choices=["exact", "minhash", "simhash", "winnow", "urls", "allpairs"],
    )
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--url-col", default="url")
    p.add_argument("--threshold", type=float, default=0.5, help="jaccard (minhash)")
    p.add_argument(
        "--scheme",
        default="xxhash64",
        choices=["xxhash64", "md5"],
        help="hash family: xxhash64 (fast, production) or md5 (externally auditable)",
    )
    p.add_argument(
        "--clusters",
        action="store_true",
        help="resolve pairs to connected components + keep-list instead of raw pairs",
    )

    p = sub.add_parser("search", help="BM25 ranked retrieval over a text corpus")
    p.add_argument("--table", required=True, help="parquet corpus with id/text columns")
    p.add_argument("--terms", required=True, help="comma-separated query terms")
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")

    p = sub.add_parser("stats", help="corpus data card (length distribution + vocabulary)")
    p.add_argument("--table", required=True, help="parquet corpus with id/text columns")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")

    p = sub.add_parser(
        "filter", help="Gopher-style quality filter: keep-rate report + kept corpus"
    )
    p.add_argument("--table", required=True, help="parquet corpus with id/text columns")
    p.add_argument("--out", help="optional parquet path for the kept documents")
    p.add_argument("--text-col", default="text")

    p = sub.add_parser(
        "repair",
        help="anti-entropy Merkle diff of two table replicas (work list of damaged blocks)",
    )
    p.add_argument("--a", required=True, help="parquet replica A")
    p.add_argument("--b", required=True, help="parquet replica B")
    p.add_argument("--key", required=True, help="integer blocking key column")
    p.add_argument("--cols", required=True, help="comma list of columns to digest")
    p.add_argument("--block-size", type=int, default=4096)
    p.add_argument("--fanout", type=int, default=64)

    p = sub.add_parser("optimize", help="space-filling-curve rewrite for multi-column data skipping")
    p.add_argument("--table", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--zorder-by", required=True, help="comma-separated numeric columns")
    p.add_argument("--files", type=int, default=64)
    p.add_argument(
        "--curve",
        default="zorder",
        choices=["zorder", "hilbert"],
        help="hilbert (exactly 2 columns) keeps adjacent cells adjacent on the curve",
    )

    args = ap.parse_args(argv)

    from datalake_etlscripts_spark.session import get_spark

    spark = get_spark(f"cli-{args.cmd}")

    if args.cmd == "ingest":
        from datalake_etlscripts_spark.versioning import empty_state, merge_batch

        fields = args.fields.split(",")
        incoming = spark.read.parquet(args.incoming)
        if args.drop:
            existing = empty_state(spark, fields)
        else:
            try:
                existing = spark.read.parquet(args.state)
            except Exception:  # noqa: BLE001 — first run
                existing = empty_state(spark, fields)
        merged = merge_batch(existing, incoming, fields, group=args.group)
        tmp = args.state + "__staging"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(args.state)
        n = spark.read.parquet(args.state).count()
        print(f"ingested: store now holds {n} rows at {args.state}")

    elif args.cmd == "summary":
        from datalake_etlscripts_spark.summary import summary_counts

        df = spark.read.parquet(args.table)
        for r in summary_counts(df, args.fields.split(",")).collect():
            print(f"{r['field']}\t{r['value']}\t{r['cnt']}")

    elif args.cmd == "sync":
        from datalake_etlscripts_spark.storage import copy_callbacks, make_store
        from datalake_etlscripts_spark.storesync import apply_sync, plan_sync

        disk_mode = bool(args.src_dir and args.dst_dir)
        if disk_mode:
            src_store = make_store(args.src_dir)
            dst_store = make_store(args.dst_dir)
            src_df = src_store.listing_df(spark)
            dst_df = dst_store.listing_df(spark)
            content = ("n_bytes",)
        elif args.src and args.dst:
            src_df = spark.read.parquet(args.src)
            dst_df = spark.read.parquet(args.dst)
            content = tuple(c for c in args.content_cols.split(",") if c)
        else:
            ap.error("sync needs --src/--dst (listings) or --src-dir/--dst-dir (disk)")
        plan = plan_sync(src_df, dst_df, name_col=args.name_col, content_cols=content)
        rows = plan.collect()
        for r in rows:
            print(f"{r['op']}\t{r[args.name_col]}")
        if args.patch_list:
            with open(args.patch_list, "w") as fh:
                for r in rows:
                    fh.write(f"{r['op']}\t{r[args.name_col]}\n")
        if not args.check_only:
            if disk_mode:
                transfer, delete = copy_callbacks(src_store, dst_store)
                counts = apply_sync(plan, transfer, delete, name_col=args.name_col)
                print(f"# applied: {counts}")
            else:
                print(
                    f"# plan only — pass --src-dir/--dst-dir to apply on disk "
                    f"({len(rows)} ops)"
                )

    elif args.cmd == "compact":
        from datalake_etlscripts_spark.versioning import current_versions

        current_versions(spark.read.parquet(args.state)).write.mode(
            "overwrite"
        ).parquet(args.out)
        print(f"compacted current versions to {args.out}")

    elif args.cmd == "purge":
        from datalake_etlscripts_spark.storage import apply_purge, make_store
        from datalake_etlscripts_spark.storesync import plan_purge

        if args.storage_dir:
            store = make_store(args.storage_dir)
            listing = store.listing_df(spark)
        elif args.listing:
            store = None
            listing = spark.read.parquet(args.listing)
        else:
            ap.error("purge needs --listing (parquet) or --storage-dir (disk)")
        plan = plan_purge(listing, spark.read.parquet(args.state), name_col=args.name_col)
        rows = plan.collect()
        for r in rows:
            print(f"{r['op']}\t{r[args.name_col]}")
        if args.dry_run:
            print(f"# dry run — {len(rows)} ops planned, nothing deleted")
        elif store is not None and args.backup_dir:
            counts = apply_purge(
                plan, store, make_store(args.backup_dir), name_col=args.name_col
            )
            print(f"# applied: {counts}")
        else:
            print(
                f"# plan only — pass --storage-dir/--backup-dir to apply "
                f"({len(rows)} ops)"
            )

    elif args.cmd == "crawl":
        from datalake_etlscripts_spark.crawl import crawl, extract_urls, prune_urls

        state = spark.read.parquet(args.state)
        urls = extract_urls(state, scalar_cols=tuple(args.fields.split(",")))
        skip = (
            spark.createDataFrame(
                [(h,) for h in args.skip_servers.split(",") if h], "host string"
            )
            if args.skip_servers
            else None
        )
        plan = prune_urls(urls, skip_servers=skip)
        if args.plan_only:
            for r in plan.collect():
                print(f"{r['ntp_id']}\t{r['field']}\t{r['url']}")
        else:
            store = None
            if args.storage_dir:
                from datalake_etlscripts_spark.storage import make_store

                store = make_store(args.storage_dir)
            fetched = crawl(plan, store=store)
            if args.out:
                fetched.write.mode("overwrite").parquet(args.out)
                print(f"fetched {spark.read.parquet(args.out).count()} docs to {args.out}")
            else:
                for r in fetched.collect():
                    print(f"{r['ntp_id']}\t{r['field']}\t{r['status']}\t{r['doc_type']}")

    elif args.cmd == "enrich":
        from datalake_etlscripts_spark.io.readers import read_jsonl
        from datalake_etlscripts_spark.operators.enrichment import (
            ANNOTATION_SCHEMA,
            enrich_state,
            resolve_annotations,
        )

        state = spark.read.parquet(args.state)
        ann = read_jsonl(spark, args.annotations, schema=ANNOTATION_SCHEMA)
        resolved = resolve_annotations(state, ann)
        tallies = (
            resolved.select(
                F.when(~F.col("found"), F.lit("unknown"))
                .when(F.col("resolved_id") != F.col("procurement_id"), F.lit("redirected"))
                .otherwise(F.lit("direct"))
                .alias("outcome")
            )
            .groupBy("outcome")
            .count()
        )
        for r in tallies.collect():
            print(f"{r['outcome']}\t{r['count']}")
        if not args.dry_run:
            out = args.out or (args.state + "__enriched")
            enrich_state(state, ann).write.mode("overwrite").parquet(out)
            n = spark.read.parquet(out).filter(
                F.col("empresas_en_docs").isNotNull()
            ).count()
            print(f"enriched {n} notices → {out}")

    elif args.cmd == "export":
        from datalake_etlscripts_spark.io.writers import write_training_shards

        n = write_training_shards(
            spark.read.parquet(args.table),
            args.out,
            rows_per_shard=args.rows_per_shard,
            shard_key=args.shard_key,
            fmt=args.format,
        )
        print(f"exported {n} shards to {args.out}")

    elif args.cmd == "explain":
        import os

        # __spark_entry__ sits next to the package — resolvable from any cwd
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __spark_entry__ as entry

        qs = entry.queries()
        if args.query not in qs:
            ap.error(f"unknown query {args.query!r}; {len(qs)} registered")
        qs[args.query](spark, args.sf_dir).explain(args.mode)

    elif args.cmd == "dedup":
        from datalake_etlscripts_spark.operators import dedup as dd

        if args.clusters and args.strategy in ("exact", "urls"):
            ap.error(
                f"--clusters needs a pair-producing strategy "
                f"(minhash/simhash/winnow/allpairs), not {args.strategy!r}"
            )
        corpus = spark.read.parquet(args.table)
        if args.strategy == "exact":
            out = dd.dedup_keep_first(corpus, args.text_col, args.id_col)
        elif args.strategy == "minhash":
            out = dd.minhash_lsh_pairs(
                corpus,
                args.text_col,
                args.id_col,
                threshold=args.threshold,
                scheme=args.scheme,
            )
        elif args.strategy == "simhash":
            out = dd.simhash_pairs(
                corpus, args.text_col, args.id_col, scheme=args.scheme
            )
        elif args.strategy == "winnow":
            out = dd.substring_duplicate_pairs(
                corpus, args.text_col, args.id_col, scheme=args.scheme
            )
        elif args.strategy == "allpairs":
            from fractions import Fraction

            t = Fraction(args.threshold).limit_denominator(1000)
            out = dd.allpairs_jaccard_pairs(
                corpus,
                threshold=(t.numerator, t.denominator),
                text_col=args.text_col,
                id_col=args.id_col,
            ).withColumnRenamed("id1", "id_a").withColumnRenamed("id2", "id_b")
        else:  # urls
            out = dd.url_duplicates(corpus, args.url_col, args.id_col)
        if args.clusters and args.strategy in ("minhash", "simhash", "winnow", "allpairs"):
            comp = dd.connected_components_star(out.select("id_a", "id_b"))
            ids = corpus.select(F.col(args.id_col).alias("node"))
            out = (
                ids.join(comp, "node", "left")
                .select(
                    F.col("node").alias(args.id_col),
                    F.coalesce("component", "node").alias("component"),
                    (F.coalesce("component", "node") == F.col("node")).alias("keep"),
                )
            )
        out.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(f"dedup[{args.strategy}]: wrote {n} rows to {args.out}")

    elif args.cmd == "search":
        from datalake_etlscripts_spark.operators.text import bm25_topk

        corpus = spark.read.parquet(args.table)
        hits = bm25_topk(
            corpus,
            [t.strip() for t in args.terms.split(",") if t.strip()],
            text_col=args.text_col,
            id_col=args.id_col,
            k=args.k,
        ).collect()  # ≤ k rows — bounded driver output, not a data collect
        for r in hits:
            print(f"{r[args.id_col]}\t{r['n_hit']}\t{r['score']:.6f}")

    elif args.cmd == "stats":
        from datalake_etlscripts_spark.operators.text import corpus_data_card

        corpus = spark.read.parquet(args.table)
        r = corpus_data_card(corpus, text_col=args.text_col).collect()[0]

        def fmt(v, spec=".1f"):
            return "n/a" if v is None else format(v, spec)

        print(
            f"docs={r['n_docs']} tokens={r['total_tokens']} "
            f"mean_len={fmt(r['mean_len'])} p50_len={fmt(r['p50_len'], '.0f')} "
            f"p95_len={fmt(r['p95_len'], '.0f')} vocab={r['vocab_size']}"
        )

    elif args.cmd == "filter":
        from datalake_etlscripts_spark.operators.text import gopher_quality_filter

        corpus = spark.read.parquet(args.table)
        filt = gopher_quality_filter(corpus, text_col=args.text_col)
        rep = filt.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.when(F.col("keep"), 1)), F.lit(0)).alias("kept"),
        ).collect()[0]
        rate = rep["kept"] / rep["n"] if rep["n"] else 0.0
        print(f"docs={rep['n']} kept={rep['kept']} keep_rate={rate:.3f}")
        rules = (
            filt.filter(~F.col("keep"))
            .select(F.explode(F.split("fail_reasons", ",")).alias("rule"))
            .groupBy("rule")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "rule")
        )
        for r in rules.collect():
            print(f"fail {r['rule']}\t{r['n']}")
        if args.out:
            kept_ids = filt.filter(F.col("keep")).select(filt.columns[0])
            corpus.join(kept_ids, filt.columns[0], "left_semi").write.mode(
                "overwrite"
            ).parquet(args.out)
            print(f"kept corpus written to {args.out}")

    elif args.cmd == "optimize":
        from datalake_etlscripts_spark.io.layout import cluster_write, hilbert_cluster_write

        cols = args.zorder_by.split(",")
        if args.curve == "hilbert":
            hilbert_cluster_write(spark.read.parquet(args.table), args.out, cols, args.files)
        else:
            cluster_write(spark.read.parquet(args.table), args.out, cols, args.files)
        print(f"{args.curve}-clustered {args.table} by {cols} into {args.files} files at {args.out}")

    elif args.cmd == "repair":
        from datalake_etlscripts_spark.storesync import (
            merkle_block_state,
            merkle_diff_blocks,
        )

        cols = args.cols.split(",")
        rep = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
        sa = merkle_block_state(
            spark.read.parquet(args.a), args.key, rep, args.block_size, args.fanout
        )
        sb = merkle_block_state(
            spark.read.parquet(args.b), args.key, rep, args.block_size, args.fanout
        )
        bad = merkle_diff_blocks(sa, sb, args.fanout).orderBy("block").collect()
        for r in bad:
            print(
                f"block={r['block']} n_a={r['n_a']} n_b={r['n_b']}"
                f" h_a={r['h_a']} h_b={r['h_b']}"
            )
        print(f"damaged_blocks={len(bad)}")
        return 0 if not bad else 1

    elif args.cmd == "check":
        from datalake_etlscripts_spark.versioning import (
            check_pointers_resolve,
            check_unique_active,
        )

        state = spark.read.parquet(args.state)
        multi = check_unique_active(state).count()
        dangling = check_pointers_resolve(state).count()
        print(f"multi_active={multi} dangling_pointers={dangling}")
        return 0 if (multi == 0 and dangling == 0) else 1

    return 0


if __name__ == "__main__":
    sys.exit(main())
