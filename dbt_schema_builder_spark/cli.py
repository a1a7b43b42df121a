"""CLI entry point — parity with the reference's console script
(reference schema_builder.py:16-123: ``build`` subcommand,
``--destination-project`` required, ``--nopii``/``--piionly`` mutually
exclusive).

Usage:
    python -m dbt_schema_builder_spark build \
        --destination-project /path/out \
        --source-dir /root/testdata/sf0.001 \
        --config config.yml [--nopii | --piionly]

The config YAML carries the same overlay surface as the reference's six
files, under one document::

    apps:
      MAIN:
        sources:
          RAW:
            INCLUDE: [customer, orders]
            SOFT_DELETE: {l_shipdate: IS NOT NULL}
            PREFIX: EVT
        redactions:
          MAIN.CUSTOMER: {C_NAME: "<redacted>"}
        banned_columns: [PROPS]
        unmanaged_tables: [MAIN.SUPPLIER]
        downstream_allow_list: []
"""

from __future__ import annotations

import argparse
import sys

import yaml

from .config import AppPolicy, SourcePolicy
from .policy.metadata import assemble_schema_doc, find_duplicates
from .session import get_spark, load_tables
from .views import TrifectaBuilder
from .views.artifacts import manual_models, write_artifacts


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(prog="dbt_schema_builder_spark")
    sub = parser.add_subparsers(dest="command", required=True)
    build = sub.add_parser("build", help="build trifecta views + artifacts")
    build.add_argument("--destination-project", required=True,
                       help="output dir for generated SQL/YAML artifacts")
    build.add_argument("--source-dir", required=True,
                       help="directory of parquet tables to introspect")
    build.add_argument("--config", required=True, help="policy config YAML")
    # mutually exclusive PII gating (reference schema_builder.py:65-80)
    group = build.add_mutually_exclusive_group()
    group.add_argument("--nopii", action="store_true",
                       help="generate only redacted (SAFE) views")
    group.add_argument("--piionly", action="store_true",
                       help="generate only PII views")
    return parser.parse_args(argv)


def policy_from_config(app: str, raw: dict) -> AppPolicy:
    sources = {
        name: SourcePolicy.from_config(name, cfg)
        for name, cfg in (raw.get("sources") or {}).items()
    }
    return AppPolicy(
        app=app,
        sources=sources,
        redactions=raw.get("redactions") or {},
        banned_columns=raw.get("banned_columns") or [],
        unmanaged_tables=raw.get("unmanaged_tables") or [],
        downstream_allow_list=raw.get("downstream_allow_list") or [],
    )


def run_build(args: argparse.Namespace) -> int:
    with open(args.config) as f:
        config = yaml.safe_load(f) or {}
    pii_mode = "nopii" if args.nopii else "piionly" if args.piionly else "both"
    spark = get_spark(app_name="dbt-schema-builder-spark-cli")
    tables = load_tables(spark, args.source_dir.rstrip("/"))
    exit_code = 0
    for app, raw in (config.get("apps") or {}).items():
        policy = policy_from_config(app, raw)
        manual = manual_models(args.destination_project, app)
        selected = {
            t: df for t, df in tables.items() if t.lower() not in manual
        }
        builder = TrifectaBuilder(spark, policy, pii_mode=pii_mode)
        result = builder.materialize(selected)
        doc = assemble_schema_doc(
            app,
            database="spark_catalog",
            sources={
                s.name: [t for t in selected if s.selects(t)]
                for s in policy.sources.values()
            },
            models={
                name: list(df.columns) for name, df in result.views.items()
            },
        )
        # downstream doc lists the SAFE schema and its _PII twin
        # (reference app.py:196-220: both trifecta halves are exposed as
        # downstream sources, gated by pii_mode)
        downstream_sources: dict[str, list[str]] = {}
        if pii_mode in ("both", "nopii"):
            downstream_sources[app] = result.downstream_sources
        if pii_mode in ("both", "piionly"):
            downstream_sources[f"{app}_PII"] = result.downstream_sources
        downstream = assemble_schema_doc(
            app,
            database="spark_catalog",
            sources=downstream_sources,
            models={},
        )
        written = write_artifacts(
            args.destination_project, app, result, doc, downstream
        )
        # dupe check over downstream table names (reference app.py:103-123,
        # builder.py:567-570)
        names = spark.createDataFrame(
            [(f"{app}.{t}",) for t in result.downstream_sources] or [("",)],
            "qualified string",
        )
        dupes = find_duplicates(names.where("qualified != ''"), ["qualified"])
        n_dupes = dupes.count()
        if n_dupes:
            print(f"ERROR: duplicate downstream tables in {app}", file=sys.stderr)
            exit_code = 1
        print(f"{app}: {len(result.views)} views, {len(written)} artifacts, "
              f"{len(result.skipped_unmanaged)} unmanaged skipped")
    return exit_code


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    if args.command == "build":
        return run_build(args)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
