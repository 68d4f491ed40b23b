"""CLI entry point — ``ray job submit``-shaped driver for the engine.

Usage (single node; on a cluster, submit via ``ray job submit -- python -m
sievedata.run ...`` with address taken from the environment):

    python -m sievedata.run profile  --baseline B --catalog C --out DIR
    python -m sievedata.run validate --input I --profiles P --bloom B --run-dir DIR
    python -m sievedata.run score    --input I --profiles P --bloom B --run-dir DIR
    python -m sievedata.run export   --input I --run-dir DIR --out DIR
                                     [--vendor V] [--from D] [--to D] [--fmt csv]
    python -m sievedata.run dedup    --input DIR --out DIR
    python -m sievedata.run fixture  --out DIR --docs N --vendors V [--ray]

Owns the Ray session (scripts/CLIs init Ray; library code never does).
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="sievedata")
    p.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    p.add_argument("--address", default=None,
                   help="Ray cluster address (e.g. 'auto' or 127.0.0.1:6379 "
                        "under ray job submit / ray start).  Default: "
                        "$RAY_ADDRESS or a throwaway local session; "
                        "--num-cpus applies only to local sessions")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("profile")
    sp.add_argument("--baseline", required=True)
    sp.add_argument("--catalog", required=True)
    sp.add_argument("--out", required=True)

    sv = sub.add_parser("validate")
    sv.add_argument("--input", required=True)
    sv.add_argument("--profiles", required=True)
    sv.add_argument("--bloom", required=True)
    sv.add_argument("--run-dir", required=True)
    sv.add_argument("--no-resume", action="store_true")
    sv.add_argument("--prev-run", default=None,
                    help="previous validate run_dir: run an INCREMENTAL "
                         "(append-only delta) pass — only new input "
                         "fragments are scanned, dup checks probe history "
                         "pruned to touched groups, verdicts merge the "
                         "previous run's persisted sketch partials")
    sv.add_argument("--stage1-waves", type=int, default=1,
                    help="intra-stage checkpoint granularity for the parse+"
                         "check scan: >1 partitions the input fragments into "
                         "this many atomically-committed waves so a killed "
                         "run resumes mid-dataset")

    sh = sub.add_parser("shard")
    sh.add_argument("--input", required=True)
    sh.add_argument("--out", required=True)
    sh.add_argument("--budget", type=int, default=100_000,
                    help="token budget per output shard")
    sh.add_argument("--no-resume", action="store_true")

    ss = sub.add_parser("score")
    ss.add_argument("--input", required=True)
    ss.add_argument("--history", default=None,
                    help="existing invoice-store path: score ONLY --input "
                         "docs, with history docs as candidates (pruned to "
                         "the groups the delta touches)")
    ss.add_argument("--prev-run", default=None,
                    help="previous score run_dir: score ONLY --input docs "
                         "against the chain's PERSISTED candidate store "
                         "(store_index-pruned; no re-parse of the store)")
    ss.add_argument("--drift-verdicts", default=None,
                    help="validate run verdicts.parquet: partitions whose "
                         "drift monitor breached are scored RULES-ONLY "
                         "(ML-003 fallback; stamped in the manifest)")
    ss.add_argument("--profiles", required=True)
    ss.add_argument("--bloom", required=True)
    ss.add_argument("--run-dir", required=True)
    ss.add_argument("--no-resume", action="store_true")
    ss.add_argument("--config", default=None,
                    help="JSON config rows [{scope, key, value}, ...] — "
                         "layered resolution vendor:{id} → global → default")

    sc = sub.add_parser("compact")
    sc.add_argument("--prev-run", required=True,
                    help="run_dir whose incremental chain to compact")
    sc.add_argument("--out", required=True, help="compacted run_dir "
                    "(becomes --prev-run for later deltas)")
    sc.add_argument("--kind", choices=("score", "validate"),
                    default="score",
                    help="score: candidate-store chain; validate: checked "
                         "layout + group-index chain")
    sc.add_argument("--no-resume", action="store_true")

    se = sub.add_parser("export")
    se.add_argument("--input", required=True, help="documents path")
    se.add_argument("--run-dir", required=True, help="score run dir (decisions/)")
    se.add_argument("--out", required=True)
    se.add_argument("--vendor", default=None)
    se.add_argument("--from", dest="date_from", default=None)
    se.add_argument("--to", dest="date_to", default=None)
    se.add_argument("--fmt", choices=("parquet", "csv"), default="parquet")

    sd = sub.add_parser("dedup")
    sd.add_argument("--input", required=True,
                    help="dir containing documents.parquet")
    sd.add_argument("--out", required=True)
    sd.add_argument("--no-resume", action="store_true")

    sf = sub.add_parser("fixture")
    sf.add_argument("--out", required=True)
    sf.add_argument("--docs", type=int, default=2000)
    sf.add_argument("--vendors", type=int, default=20)
    sf.add_argument("--seed", type=int, default=42)
    sf.add_argument("--ray", action="store_true", help="parallel sharded generation")

    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        addr = args.address or os.environ.get("RAY_ADDRESS", "local")
        kwargs = dict(address=addr, ignore_reinit_error=True,
                      logging_level="ERROR")
        if addr == "local":
            # spin up a throwaway single-node session; on a real cluster
            # (--address / ray job submit) resources come from the nodes
            kwargs.update(num_cpus=args.num_cpus, include_dashboard=False)
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    try:
        if args.cmd == "profile":
            from sievedata.pipelines.profile import build_profiles

            out = build_profiles(args.baseline, args.catalog, args.out)
        elif args.cmd == "validate":
            from sievedata.pipelines.validate import (ValidateConfig,
                                                      validate_documents)

            vcfg = (ValidateConfig(stage1_waves=args.stage1_waves)
                    if args.stage1_waves > 1 else None)
            out = validate_documents(
                args.input, args.profiles, args.bloom, args.run_dir,
                cfg=vcfg, resume=not args.no_resume,
                prev_run_dir=args.prev_run,
            )
        elif args.cmd == "score":
            from sievedata.pipelines.score import ScoreConfig, score_documents

            cfg = None
            if args.config:
                from sievedata.config import ConfigStore

                cfg = ScoreConfig(config=ConfigStore.from_json(args.config))
            out = score_documents(
                args.input, args.profiles, args.bloom, args.run_dir,
                cfg=cfg, resume=not args.no_resume,
                history_path=args.history,
                prev_run_dir=args.prev_run,
                drift_verdicts_path=args.drift_verdicts,
            )
        elif args.cmd == "compact":
            if args.kind == "validate":
                from sievedata.pipelines.validate import compact_validate_runs

                out = compact_validate_runs(args.prev_run, args.out,
                                            resume=not args.no_resume)
            else:
                from sievedata.pipelines.score import compact_score_store

                out = compact_score_store(args.prev_run, args.out,
                                          resume=not args.no_resume)
        elif args.cmd == "shard":
            from sievedata.pipelines.shard import shard_corpus

            out = shard_corpus(args.input, args.out, budget=args.budget,
                               resume=not args.no_resume)
        elif args.cmd == "dedup":
            from sievedata.pipelines.dedup import dedup_corpus

            out = dedup_corpus(args.input, args.out,
                               resume=not args.no_resume)
        elif args.cmd == "export":
            from sievedata.pipelines.export import export_decisions

            out = export_decisions(
                args.input, args.run_dir, args.out, vendor=args.vendor,
                date_from=args.date_from, date_to=args.date_to, fmt=args.fmt,
            )
        else:
            if args.ray:
                from sievedata.fixtures import generate_fixture_ray

                out = generate_fixture_ray(args.out, args.docs, args.vendors, args.seed)
            else:
                from sievedata.fixtures import generate_fixture

                out = generate_fixture(args.out, args.docs, args.vendors, args.seed)
        print(json.dumps(out, default=str))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
