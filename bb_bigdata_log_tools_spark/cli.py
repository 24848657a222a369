"""Command-line tools: ``logcat``, ``loggrep``, ``logsearch``,
``logmultisearch`` — argument-compatible with the reference's bin/
wrappers (``/root/reference/src/com/blackberry/logtools/logcat.java``
etc. and the usage text in the reference README).

Shared argument surface::

    REQUIRED: -dc=DC -svc=SERVICE -comp=COMPONENT -start=T -end=T
    tool-specific: -string=S (logsearch) | -regex=R (loggrep) |
                   -strings=FILE_OR_DIR (logmultisearch)
    OPTIONS: --out=DIR  --i (case-insensitive)  --a (AND multisearch)
             --dateFormat=RFC822|RFC3164|RFC5424|<pattern>
             --fieldSeparator=X (separator for --raw intermediate-format
             output; default U+001F)  --raw (emit the reference's
             intermediate separator-joined fields, unformatted/unsorted)
             --silent  --v  --r/--l (accepted; Spark always plans the
             sort itself — the local/remote split is obsolete here)
             --skipCorrupt (salvage damaged .bm trees: resync past
             corrupt container blocks instead of failing the run)

Times accept epoch seconds, epoch millis, ``now``, or common date
strings (``Feb 28, 2012 10:00``, ISO). Order of arguments does not
matter (reference README: "Order of arguments do not matter").

Data goes to stdout (between the reference's data markers), notices to
stderr — same stream discipline as the reference, so shell pipelines
keep working.
"""

from __future__ import annotations

import os
import re
import sys
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

if __package__ in (None, ""):  # invoked as a bare script: bootstrap sys.path
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bb_bigdata_log_tools_spark.operators import logops
from bb_bigdata_log_tools_spark.sources.boom import read_boom

DATA_MARKER = ";#################### DATA MARKER ####################"

DATE_FORMATS = [
    "%b %d, %Y %H:%M",
    "%b %d, %Y %H:%M:%S",
    "%Y-%m-%d %H:%M",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%dT%H:%M:%S",
    "%Y/%m/%d %H:%M",
    "%Y%m%d%H",
]


def parse_time(value: str) -> int:
    """Flexible time → epoch ms (reference LogTools.parseDate)."""
    value = value.strip()
    if value == "now":
        return int(time.time() * 1000)
    if re.fullmatch(r"\d{13}", value):
        return int(value)
    if re.fullmatch(r"\d{1,11}", value):
        return int(value) * 1000
    for fmt in DATE_FORMATS:
        try:
            return int(
                datetime.strptime(value, fmt)
                .replace(tzinfo=timezone.utc)
                .timestamp()
                * 1000
            )
        except ValueError:
            continue
    raise SystemExit(f";******************** ERROR: cannot parse time: {value}")


def resolve_paths(
    root: str, dc: str, svc: str, comp: str, start_ms: int, end_ms: int
) -> list[str]:
    """CatByTime-style path pruning: hourly dirs inside [start, end).

    Layout: ``<root>/<dc>/<svc>/<type>/<yyyyMMdd>/<HH>/<comp>/data``.
    Only hours overlapping the window are listed — the hand-rolled
    partition pruning of the reference, kept for .bm trees (parquet
    tables get this from Catalyst instead).
    """
    out = []
    svc_dir = os.path.join(root, dc, svc)
    if not os.path.isdir(svc_dir):
        return out
    hour_ms = 3600 * 1000
    for log_type in sorted(os.listdir(svc_dir)):
        type_dir = os.path.join(svc_dir, log_type)
        if not os.path.isdir(type_dir):
            continue
        for date_s in sorted(os.listdir(type_dir)):
            if not re.fullmatch(r"\d{8}", date_s):
                continue
            for hour_s in sorted(os.listdir(os.path.join(type_dir, date_s))):
                if not re.fullmatch(r"\d{2}", hour_s):
                    continue
                t0 = int(
                    datetime.strptime(f"{date_s}{hour_s}", "%Y%m%d%H")
                    .replace(tzinfo=timezone.utc)
                    .timestamp()
                    * 1000
                )
                if t0 + hour_ms <= start_ms or t0 >= end_ms:
                    continue
                comp_dir = os.path.join(type_dir, date_s, hour_s, comp, "data")
                if os.path.isdir(comp_dir):
                    out.append(comp_dir)
    return out


def parse_args(argv: list[str]) -> dict:
    opts: dict = {"flags": set(), "D": []}
    for arg in argv:
        if arg.startswith("--") and "=" in arg:
            k, v = arg[2:].split("=", 1)
            opts[k] = v
        elif arg.startswith("--"):
            opts["flags"].add(arg[2:])
        elif arg.startswith("-D"):
            opts["D"].append(arg[2:])
        elif arg.startswith("-") and "=" in arg:
            k, v = arg[1:].split("=", 1)
            opts[k] = v.strip("'\"")
        else:
            opts.setdefault("positional", []).append(arg)
    return opts


def _require(opts: dict, tool: str, keys: list[str]) -> list[str]:
    missing = [k for k in keys if k not in opts]
    if missing:
        sys.stderr.write(";****************************************\n")
        sys.stderr.write(f"          NOT ENOUGH ARGUMENTS\n")
        sys.stderr.write(
            f"\n  USAGE: {tool} [REQUIRED ARGUMENTS] [OPTIONS] (Order does not matter)\n"
        )
        sys.stderr.write(
            "  REQUIRED ARGUMENTS:\n"
            "    -dc=[DATACENTER]  -svc=[SERVICE]  -comp=[COMPONENT]\n"
            "    -start=[START]    -end=[END]\n"
        )
        sys.stderr.write(f"  MISSING: {', '.join('-' + m for m in missing)}\n")
        sys.stderr.write(";****************************************\n")
        raise SystemExit(1)
    return [opts[k] for k in keys]


def _emit(df: DataFrame, opts: dict) -> None:
    from pyspark.sql import functions as F

    from bb_bigdata_log_tools_spark.schema import DEFAULT_FIELD_SEPARATOR

    date_format = opts.get("dateFormat", "RFC5424")
    if "raw" in opts["flags"]:
        # the reference's INTERMEDIATE file format: separator-joined raw
        # fields (ts<SEP>message<SEP>eventId<SEP>createTime<SEP>blockNo
        # <SEP>lineNo), --fieldSeparator default U+001F
        sep = opts.get("fieldSeparator", DEFAULT_FIELD_SEPARATOR)
        cols = [c for c in logops.RAW_COLUMNS if c in df.columns]
        out = df.select(
            F.concat_ws(sep, *[F.col(c).cast("string") for c in cols]).alias("line")
        )
    else:
        # LogTools-style local-vs-remote sort pick (reference
        # src/com/blackberry/logtools/LogTools.java decides --l/--r by
        # estimated result size): --r forces the range-partitioned
        # distributed orderBy, --l forces the single-partition local
        # sort, and the default AUTO-picks by the actual filtered row
        # count — small results skip the range sampler's second parent
        # pass entirely (small_sort), huge ones spill to the
        # distributed orderBy above its row threshold.
        from bb_bigdata_log_tools_spark.operators.util import small_sort

        out = logops.format_and_sort(df, date_format=date_format, sort=False)
        sort_cols = [
            c
            for c in ("ts", "create_time", "block_no", "line_no")
            if c in out.columns
        ]
        if "r" in opts["flags"]:
            out = out.orderBy(*sort_cols)
        elif "l" in opts["flags"]:
            out = out.repartition(1).sortWithinPartitions(*sort_cols)
        else:
            out = small_sort(out, *sort_cols)
    silent = "silent" in opts["flags"]
    if not silent:
        sys.stderr.write(DATA_MARKER + "\n")
    target = opts.get("out")
    if target:
        # FirstItemOnlyStoreFunc-style distributed sink: only the line
        # column lands, results never funnel through the driver, and
        # sorted range partitions arrive as lexicographically ordered
        # part files, so `cat part-*` preserves the total order
        from bb_bigdata_log_tools_spark.sources.logs import write_first_item_text

        write_first_item_text(out, target, col="line")
        sys.stderr.write(f"; results written to {target}\n")
    else:
        # stream partitions through the driver one at a time (bounded
        # memory on huge result sets, reference parity: the client
        # streams job output to stdout)
        for row in out.select("line").toLocalIterator():
            sys.stdout.write(row["line"] + "\n")
    if not silent:
        sys.stderr.write(DATA_MARKER + "\n")


def _load(opts: dict, tool: str, extra: list[str]) -> tuple:
    """Validate args and resolve paths BEFORE starting the JVM — bad
    invocations fail in milliseconds, not after a Spark session boot."""
    dc, svc, comp, start_s, end_s = _require(
        opts, tool, ["dc", "svc", "comp", "start", "end"]
    )
    values = [opts.get(k) for k in extra]
    if any(v is None for v in values):
        _require(opts, tool, extra)
    start_ms, end_ms = parse_time(start_s), parse_time(end_s)
    if end_ms <= start_ms:
        raise SystemExit(";******************** ERROR: end must be after start")
    root = opts.get("root", "/service")
    paths = resolve_paths(root, dc, svc, comp, start_ms, end_ms)
    if not paths:
        sys.stderr.write("; no matching log directories\n")
        raise SystemExit(0)
    spark = _spark()
    # --skipCorrupt: salvage damaged .bm trees (sync-marker resync past
    # corrupt blocks) instead of failing the run — see read_boom
    skip_corrupt = "skipCorrupt" in opts["flags"]
    df = read_boom(spark, paths[0], skip_corrupt=skip_corrupt)
    for extra_path in paths[1:]:
        df = df.unionByName(
            read_boom(spark, extra_path, skip_corrupt=skip_corrupt)
        )
    return df, start_ms, end_ms, values


def _spark() -> SparkSession:
    from bb_bigdata_log_tools_spark.session import get_spark

    return get_spark("logtools")


def logcat(argv: list[str]) -> None:
    opts = parse_args(argv)
    df, start_ms, end_ms, _ = _load(opts, "logcat", [])
    _emit(logops.cat(df, start_ms, end_ms), opts)


def logsearch(argv: list[str]) -> None:
    opts = parse_args(argv)
    df, start_ms, end_ms, (term,) = _load(opts, "logsearch", ["string"])
    _emit(
        logops.search(df, term, start_ms, end_ms, "i" in opts["flags"]),
        opts,
    )


def loggrep(argv: list[str]) -> None:
    opts = parse_args(argv)
    df, start_ms, end_ms, (regex,) = _load(opts, "loggrep", ["regex"])
    _emit(
        logops.grep(df, regex, start_ms, end_ms, "i" in opts["flags"]),
        opts,
    )


def logmultisearch(argv: list[str]) -> None:
    opts = parse_args(argv)
    df, start_ms, end_ms, (strings_path,) = _load(
        opts, "logmultisearch", ["strings"]
    )
    terms: list[str] = []
    paths = (
        [os.path.join(strings_path, f) for f in sorted(os.listdir(strings_path))]
        if os.path.isdir(strings_path)
        else [strings_path]
    )
    for p in paths:
        with open(p, encoding="utf-8") as f:
            # dos2unix normalization, as the reference does for Windows files
            terms.extend(
                line.strip().replace("\r", "") for line in f if line.strip()
            )
    _emit(
        logops.multisearch(
            df,
            terms,
            start_ms,
            end_ms,
            case_insensitive="i" in opts["flags"],
            match_all="a" in opts["flags"],
        ),
        opts,
    )


TOOLS = {
    "logcat": logcat,
    "logsearch": logsearch,
    "loggrep": loggrep,
    "logmultisearch": logmultisearch,
}


def main() -> None:
    prog = os.path.basename(sys.argv[0])
    if prog not in TOOLS and len(sys.argv) > 1 and sys.argv[1] in TOOLS:
        TOOLS[sys.argv[1]](sys.argv[2:])
    elif prog in TOOLS:
        TOOLS[prog](sys.argv[1:])
    else:
        sys.stderr.write(f"usage: cli.py {{{'|'.join(TOOLS)}}} [args]\n")
        raise SystemExit(1)


if __name__ == "__main__":
    main()
