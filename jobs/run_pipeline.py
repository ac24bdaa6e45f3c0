"""spark-submit entry point for the dedup pipeline.

Usage (sandbox / local):
    spark-submit --py-files dist/dedup.zip jobs/run_pipeline.py \
        --synthetic 2000 --work-dir /tmp/dedup_run

    spark-submit --py-files dist/dedup.zip jobs/run_pipeline.py \
        --input /path/to/code_files_parquet --work-dir /tmp/dedup_run

On a real cluster the same invocation runs with --master yarn/k8s and the
input is an Iceberg table path; the pipeline is resumable — re-running with
the same --work-dir skips committed stages (see src/dedup/pipeline.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path


def main() -> int:
    ap = argparse.ArgumentParser(description="near-dup detection + clustering")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="corpus source with columns "
                                     "(repo, path, commit, lang, content); "
                                     "parquet dir/file, .jsonl, or .csv")
    src.add_argument("--synthetic", type=int, metavar="N",
                     help="generate an N-row planted-clone corpus instead")
    src.add_argument("--ingest", metavar="PARQUET",
                     help="incrementally cluster a NEW batch (parquet, same "
                          "columns) against an existing --work-dir index")
    src.add_argument("--build-emb-index", metavar="PARQUET",
                     help="build the persistent IVF embedding index + "
                          "initial near-dup clusters from a base corpus "
                          "(parquet with columns vec_id, embedding)")
    src.add_argument("--ingest-emb", metavar="PARQUET",
                     help="incrementally cluster a NEW embedding batch "
                          "against an existing --work-dir index")
    src.add_argument("--build-span-index", metavar="PARQUET",
                     help="build the persistent duplicated-span index + "
                          "per-doc dup stats from a base corpus (parquet "
                          "with columns doc_id, text)")
    src.add_argument("--ingest-spans", metavar="PARQUET",
                     help="incrementally fold a NEW document batch into an "
                          "existing --work-dir span index")
    ap.add_argument("--work-dir", required=True,
                    help="checkpoint/output root (ledger + snapshot tables)")
    ap.add_argument("--format", dest="fmt", default=None,
                    choices=["parquet", "jsonl", "csv"],
                    help="override source format (default: by extension)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--master", default=None,
                    help="override master (default: env SPARK_GRAFT_MASTER or local[32])")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true",
                    help="recompute every stage even if committed")
    ap.add_argument("--tau", type=float, default=0.90,
                    help="cosine threshold for the embedding channel")
    args = ap.parse_args()

    # --py-files puts the zip on sys.path for the driver too, but allow
    # running straight from the repo checkout as well.
    repo_src = Path(__file__).resolve().parent.parent / "src"
    if repo_src.is_dir() and str(repo_src) not in sys.path:
        sys.path.insert(0, str(repo_src))

    from dedup.config import DedupConfig
    from dedup.pipeline import Pipeline
    from dedup.session import build_session

    cfg_kwargs = {"seed": args.seed}
    if args.shuffle_partitions:
        cfg_kwargs["shuffle_partitions"] = args.shuffle_partitions
    config = DedupConfig(**cfg_kwargs)

    spark = build_session("dedup-pipeline", master=args.master, config=config)
    t0 = time.time()
    if args.build_emb_index or args.ingest_emb:
        from dedup.incremental_ann import (
            build_embedding_index, ingest_embeddings,
        )
        from dedup.ledger import Ledger
        from dedup.storage import TableStore

        work = Path(args.work_dir)
        store = TableStore(work / "tables")
        if args.build_emb_index:
            emb = spark.read.parquet(args.build_emb_index)
            clusters = build_embedding_index(
                spark, config, store, emb, args.tau
            )
            mode = "build_emb_index"
            n_batch = emb.count()
        else:
            ledger = Ledger(work / "ledger")
            batch = spark.read.parquet(args.ingest_emb)
            n_batch = batch.count()
            clusters = ingest_embeddings(
                spark, config, store, ledger, batch, args.tau
            )
            mode = "ingest_emb"
        print(json.dumps({
            "mode": mode,
            "batch_vectors": n_batch,
            "vectors_total": clusters.count(),
            "clusters": clusters.select("cluster_id").distinct().count(),
            "wall_s": round(time.time() - t0, 2),
            "work_dir": str(args.work_dir),
        }))
        spark.stop()
        return 0
    if args.build_span_index or args.ingest_spans:
        from dedup.incremental_spans import (
            build_span_index, ingest_spans, read_span_stats,
        )
        from dedup.ledger import Ledger
        from dedup.storage import TableStore

        work = Path(args.work_dir)
        store = TableStore(work / "tables")
        if args.build_span_index:
            docs = spark.read.parquet(args.build_span_index)
            stats = build_span_index(spark, config, store, docs)
            mode = "build_span_index"
            n_batch = docs.count()
        else:
            ledger = Ledger(work / "ledger")
            batch = spark.read.parquet(args.ingest_spans)
            n_batch = batch.count()
            stats = ingest_spans(spark, config, store, ledger, batch)
            mode = "ingest_spans"
        from pyspark.sql import functions as F
        agg = stats.agg(
            F.count(F.lit(1)).alias("docs"),
            F.count(F.when(F.col("n_dup_spans") > 0, 1)).alias("dup_docs"),
        ).collect()[0]
        print(json.dumps({
            "mode": mode,
            "batch_docs": n_batch,
            "docs_with_spans": agg["docs"],
            "docs_with_dup_spans": agg["dup_docs"],
            "wall_s": round(time.time() - t0, 2),
            "work_dir": str(args.work_dir),
        }))
        spark.stop()
        return 0
    if args.ingest:
        pipe = Pipeline(spark, config, args.work_dir)
        from dedup.sources import load_corpus

        batch, n_rejected = load_corpus(spark, args.ingest, args.fmt)
        n_batch = batch.count()
        clusters = pipe.ingest(batch)
        wall = time.time() - t0
        print(json.dumps({
            "mode": "ingest",
            "batch_files": n_batch,
            "docs_total": clusters.count(),
            "clusters": clusters.select("cluster_id").distinct().count(),
            "wall_s": round(wall, 2),
            "rejected_rows": n_rejected,
            "work_dir": str(args.work_dir),
        }))
        spark.stop()
        return 0
    if args.synthetic:
        from dedup.corpus import generate_corpus

        corpus = generate_corpus(args.synthetic, seed=args.seed)
        files = spark.createDataFrame(corpus.files)
        n_files = len(corpus.files)
    else:
        from dedup.sources import load_corpus

        files, n_rejected = load_corpus(spark, args.input, args.fmt)
        n_files = files.count()
        if n_rejected:
            print(f"rejected {n_rejected} rows with NULL key/content",
                  file=sys.stderr)

    pipe = Pipeline(spark, config, args.work_dir)
    clusters = pipe.run(files, resume=not args.no_resume)

    n_docs = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    n_dups = clusters.where("doc_id != cluster_id").count()
    wall = time.time() - t0
    summary = {
        "files": n_files,
        "docs": n_docs,
        "clusters": n_clusters,
        "duplicates": n_dups,
        "wall_s": round(wall, 2),
        "files_per_sec": round(n_files / wall, 1),
        "stages": [
            {"name": r.name, "skipped": r.skipped, "wall_s": round(r.wall_s, 2)}
            for r in pipe.results
        ],
        "work_dir": str(args.work_dir),
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
