"""CLI veneer mirroring the reference's Typer commands (cli.py:16-254)
on argparse (typer isn't available in this environment). Parameter
parsing semantics preserved:

- ``--variables "name=layer,name2=layer2"`` → ordered tuple list
  (reference cli.py:93-105)
- ``--beams`` 'power'/'coverage'/comma list (cli.py:107-112)
- ``--filter-month LO HI`` inclusive month band (cli.py:114-115)
- ``--subset-vector`` repeatable path (cli.py:117-120)
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_variables(spec: str | None) -> list[tuple[str, str]] | None:
    """``"name=layer,..."`` → [(name, layer), ...] (reference cli.py:93-105)."""
    if not spec:
        return None
    out = []
    for item in spec.split(","):
        item = item.strip()
        if not item:
            continue
        if "=" not in item:
            raise ValueError(f"variable spec must be name=layer, got {item!r}")
        name, layer = item.split("=", 1)
        out.append((name.strip(), layer.strip()))
    return out


def parse_beams(spec: str | None):
    """'power' | 'coverage' | 'BEAM0000,BEAM0101' | None (cli.py:107-112)."""
    if not spec:
        return None
    if spec.lower() in ("power", "coverage"):
        return spec.lower()
    return [b.strip() for b in spec.split(",") if b.strip()]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="gedixr-spark", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    ext = sub.add_parser("extract", help="extract shots from granules (reference cli.py:16-127)")
    ext.add_argument("directory")
    ext.add_argument("--gedi-product", default="L2B", choices=["L2A", "L2B"])
    ext.add_argument("--variables", default=None, help="name=layer,name2=layer2")
    ext.add_argument("--beams", default=None, help="power|coverage|BEAM0000,BEAM0101")
    ext.add_argument("--filter-month", nargs=2, type=int, default=None, metavar=("LO", "HI"))
    ext.add_argument("--subset-vector", action="append", default=None)
    ext.add_argument("--no-quality-filter", action="store_true")
    ext.add_argument("--output-dir", default=None)

    mrg = sub.add_parser("merge", help="merge extracted L2A/L2B tables (reference xr.py:11-41)")
    mrg.add_argument("--l2a", default=None)
    mrg.add_argument("--l2b", default=None)
    mrg.add_argument("--how", default="inner")
    mrg.add_argument("--out", required=True)

    dl = sub.add_parser("download", help="submit a Harmony subsetting job (reference cli.py:156-254)")
    dl.add_argument("directory")
    dl.add_argument("--gedi-product", default="L2B", choices=["L2A", "L2B"])
    dl.add_argument("--time-range", nargs=2, default=None, metavar=("START", "STOP"))
    dl.add_argument("--subset-bbox", nargs=4, type=float, default=None,
                    metavar=("XMIN", "YMIN", "XMAX", "YMAX"))
    dl.add_argument("--subset-vector", default=None)
    dl.add_argument("--job-id", default=None)

    # pipeline-ops subcommands (extension surface; no reference twin)
    prof = sub.add_parser("profile", help="one-pass column census of a parquet table")
    prof.add_argument("path")

    card = sub.add_parser("card", help="corpus data card of a documents table")
    card.add_argument("path")
    card.add_argument("--text-col", default="text")
    card.add_argument("--lang-col", default="lang")

    cmp = sub.add_parser("compact", help="compact small files (in place)")
    cmp.add_argument("path")
    cmp.add_argument("--target-mb", type=int, default=128)
    cmp.add_argument("--sort-by", default=None, help="comma list → clustering compaction")

    vac = sub.add_parser("vacuum", help="remove crashed-compaction/merge staging dirs")
    vac.add_argument("path")

    hist = sub.add_parser("history", help="commit history of a versioned table")
    hist.add_argument("path")

    tvac = sub.add_parser(
        "tvacuum", help="vacuum a versioned table (delete unreferenced data files)"
    )
    tvac.add_argument("path")
    tvac.add_argument("--keep-last", type=int, default=2)
    tvac.add_argument(
        "--retention-hours", type=float, default=168.0,
        help="skip files newer than this (in-flight-commit race guard); "
        "0 only when no writer can be running",
    )

    rb = sub.add_parser("rollback", help="roll a versioned table back to a version")
    rb.add_argument("path")
    rb.add_argument("--to-version", type=int, required=True)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from gedixr_spark.session import get_spark

    if args.command == "extract":
        from gedixr_spark.api import extract_data

        spark = get_spark("gedixr-cli")
        df, out = extract_data(
            spark,
            args.directory,
            gedi_product=args.gedi_product,
            variables=parse_variables(args.variables),
            beams=parse_beams(args.beams),
            filter_month=tuple(args.filter_month) if args.filter_month else None,
            subset_vector=args.subset_vector,
            apply_quality_filter=not args.no_quality_filter,
            output_dir=args.output_dir,
        )
        print(json.dumps({"rows": df.count(), "output": out}))
        return 0

    if args.command == "merge":
        from gedixr_spark.sources.shots import load_shots

        spark = get_spark("gedixr-cli")
        merged = load_shots(spark, l2a=args.l2a, l2b=args.l2b, how=args.how)
        merged.write.mode("error").parquet(args.out)
        print(json.dumps({"rows": merged.count(), "output": args.out}))
        return 0

    if args.command == "download":
        from gedixr_spark.sources.download import download_data

        paths, job_id = download_data(
            args.directory,
            gedi_product=args.gedi_product,
            time_range=tuple(args.time_range) if args.time_range else None,
            subset_bbox=tuple(args.subset_bbox) if args.subset_bbox else None,
            subset_vector=args.subset_vector,
            job_id=args.job_id,
        )
        print(json.dumps({"files": [str(p) for p in paths], "job_id": job_id}))
        return 0

    if args.command == "profile":
        from gedixr_spark.operators.stats import profile_table

        spark = get_spark("gedixr-cli")
        rows = profile_table(spark.read.parquet(args.path)).collect()
        print(json.dumps([r.asDict() for r in rows], default=str))
        return 0

    if args.command == "card":
        from gedixr_spark.operators.report import corpus_card

        spark = get_spark("gedixr-cli")
        card = corpus_card(
            spark.read.parquet(args.path),
            text_col=args.text_col,
            lang_col=args.lang_col,
        )
        print(json.dumps(card, default=str))
        return 0

    if args.command == "compact":
        from gedixr_spark.operators.layout import compact_table

        spark = get_spark("gedixr-cli")
        res = compact_table(
            spark,
            args.path,
            target_mb=args.target_mb,
            sort_by=args.sort_by.split(",") if args.sort_by else None,
        )
        print(json.dumps(res))
        return 0

    if args.command == "vacuum":
        from gedixr_spark.operators.layout import vacuum_staging

        spark = get_spark("gedixr-cli")
        print(json.dumps({"removed": vacuum_staging(spark, args.path)}))
        return 0

    if args.command == "history":
        from gedixr_spark.sinks.versioned import table_history

        spark = get_spark("gedixr-cli")
        hist = [
            {k: e[k] for k in ("version", "op", "meta")}
            | {"n_add": len(e.get("add", [])), "n_remove": len(e.get("remove", []))}
            for e in table_history(spark, args.path)
        ]
        print(json.dumps(hist))
        return 0

    if args.command == "tvacuum":
        from gedixr_spark.sinks.versioned import vacuum_versioned

        spark = get_spark("gedixr-cli")
        deleted = vacuum_versioned(
            spark, args.path, keep_last=args.keep_last,
            retention_hours=args.retention_hours,
        )
        print(json.dumps({"deleted": deleted}))
        return 0

    if args.command == "rollback":
        from gedixr_spark.sinks.versioned import rollback

        spark = get_spark("gedixr-cli")
        entry = rollback(spark, args.path, to_version=args.to_version)
        print(json.dumps({"version": entry["version"], "meta": entry["meta"]}))
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
