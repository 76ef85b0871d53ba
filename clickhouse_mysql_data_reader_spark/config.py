"""Config/CLI surface (O4) — the product face of the engine.

Mirrors the reference's user surface (clioptions.py:89-574 option
names, AggregatedOptions clioptions.py:639-751, config-file layering
config.py:30-431) re-expressed for a Spark runtime:

- same verbs: ``--create-table-sql`` / ``--create-table-json-template``
  / ``--migrate-table`` / ``--pump-data`` / ``--dry``;
- same source/destination spec style: ``--src-host/--src-port/
  --src-user/--src-password/--src-schemas/--src-tables/
  --src-tables-prefixes/--src-tables-where-clauses/--src-file`` and
  ``--dst-schema/--dst-table/--dst-table-prefix/--dst-distribute``;
- same column policy: ``--column-skip``, ``--column-default-value``;
- config file (INI) + CLI layering with CLI winning, like the
  reference's configobj merge (clioptions.py:785-800).

Spark-native additions: ``--src-parquet-dir`` (read landed parquet —
the in-container stand-in for a live MySQL), ``--dst-parquet-dir``
(the MergeTree-equivalent destination), JDBC scan parallelism knobs
(``--src-partition-column/--num-partitions``), and checkpoint/trigger
knobs for the pump whose roles map 1:1 onto the reference's
binlog-position-file and mempool flush settings.
"""

from __future__ import annotations

import argparse
import configparser
import os
from dataclasses import dataclass, field


def _split_csv(value: str | None) -> list[str]:
    if not value:
        return []
    return [v.strip() for v in value.split(",") if v.strip()]


def _parse_kv_pairs(pairs: list[str] | None) -> dict[str, str]:
    """``column=default`` pairs (clioptions.py column-default-value)."""
    out: dict[str, str] = {}
    for p in pairs or []:
        if "=" not in p:
            raise ValueError(f"expected key=value, got {p!r}")
        k, v = p.split("=", 1)
        out[k.strip()] = v
    return out


@dataclass
class SourceConfig:
    host: str | None = None
    port: int = 3306
    user: str = "root"
    password: str = ""
    schemas: list[str] = field(default_factory=list)
    tables: list[str] = field(default_factory=list)
    tables_prefixes: list[str] = field(default_factory=list)
    tables_where_clauses: list[str] = field(default_factory=list)
    file: str | None = None  # CSV source (--src-file)
    parquet_dir: str | None = None  # landed-parquet source
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int = 8

    @property
    def jdbc_url(self) -> str | None:
        if not self.host:
            return None
        return f"jdbc:mysql://{self.host}:{self.port}"

    def where_for(self, table: str) -> str | None:
        """Positional WHERE pairing, same contract as the reference:
        --src-tables=t1,t2 --src-tables-where-clauses=w1,w2. As in the
        reference (tablemigrator.py:69-119), a clause that names an
        existing file is read from that file (first line wins, matching
        its ``readline()``)."""
        if not self.tables_where_clauses:
            return None
        try:
            idx = self.tables.index(table)
        except ValueError:
            return None
        if idx >= len(self.tables_where_clauses):
            return None
        clause = self.tables_where_clauses[idx]
        if clause and os.path.isfile(clause):
            with open(clause) as f:
                clause = f.readline().strip()
        return clause or None


@dataclass
class DestConfig:
    parquet_dir: str | None = None
    file: str | None = None  # CSV destination (--dst-file)
    host: str | None = None  # JDBC destination
    port: int = 3306
    user: str = "root"
    password: str = ""
    schema: str | None = None
    table: str | None = None
    table_prefix: str | None = None
    distribute: bool = False
    create_table: bool = False

    @property
    def jdbc_url(self) -> str | None:
        if not self.host:
            return None
        return f"jdbc:mysql://{self.host}:{self.port}"


@dataclass
class ColumnPolicy:
    skip: list[str] = field(default_factory=list)
    defaults: dict[str, str] = field(default_factory=dict)
    empty_string_as_null: bool = True


@dataclass
class PumpConfig:
    cdc_dir: str | None = None  # CDC event stream directory (JSON)
    checkpoint_dir: str | None = None  # O5: binlog-position-file analogue
    key_cols: list[str] = field(default_factory=list)
    snapshot_root: str | None = None
    max_files_per_trigger: int | None = None  # mempool-max-events-num analogue
    flush_interval_secs: float | None = None  # mempool-max-flush-interval
    available_now: bool = False  # drain-and-stop (src-wait=False analogue)


@dataclass
class CurateConfig:
    """--curate-data verb inputs: the LLM-corpus curation pipeline
    (curation.py) driven from the same config/CLI surface as the
    migration verbs. ``config_file`` is a JSON object of
    CurationConfig keyword arguments (validated by its __post_init__);
    ``state_dir`` switches batch curate() to curate_increment()
    against the landed state (daily-batch mode)."""

    config_file: str | None = None
    state_dir: str | None = None
    benchmark_dir: str | None = None  # decontamination corpus (parquet)
    text_col: str = "text"
    id_col: str = "doc_id"
    # batch tag for RETRYABLE increment appends: a rerun of the same
    # batch with the same (run_id, epoch_id) excludes its own prior
    # state append from every history join instead of anti-joining the
    # batch against itself to empty (CurationState.write's documented
    # remedy, now reachable from the verb)
    epoch_id: int | None = None
    run_id: str | None = None
    # streaming mode: treat --src-parquet-dir as a STREAMING parquet
    # source, run curate_stream with this checkpoint dir (drain-and-stop
    # via availableNow, resumable — the pump's binlog-position analogue)
    stream_checkpoint: str | None = None


@dataclass
class AppConfig:
    # verbs (exactly one)
    create_table_sql: bool = False
    create_table_json: bool = False
    migrate_table: bool = False
    pump_data: bool = False
    profile_table: bool = False  # monitoring verb beyond reference parity
    curate_data: bool = False  # LLM-corpus curation verb beyond parity
    curation_report: bool = False  # read-only state ops report

    with_create_database: bool = False
    dry: bool = False
    log_level: str = "WARN"

    src: SourceConfig = field(default_factory=SourceConfig)
    dst: DestConfig = field(default_factory=DestConfig)
    columns: ColumnPolicy = field(default_factory=ColumnPolicy)
    pump: PumpConfig = field(default_factory=PumpConfig)
    curate: CurateConfig = field(default_factory=CurateConfig)

    def verb(self) -> str:
        chosen = [
            v
            for v, on in (
                ("create-table-sql", self.create_table_sql),
                ("create-table-json-template", self.create_table_json),
                ("migrate-table", self.migrate_table),
                ("pump-data", self.pump_data),
                ("profile-table", self.profile_table),
                ("curate-data", self.curate_data),
                ("curation-report", self.curation_report),
            )
            if on
        ]
        if len(chosen) != 1:
            raise ValueError(
                f"exactly one of --create-table-sql / --create-table-json-template"
                f" / --migrate-table / --pump-data / --profile-table / "
                f"--curate-data / --curation-report required, "
                f"got {chosen or 'none'}"
            )
        return chosen[0]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="clickhouse-mysql-spark",
        description="PySpark-native data reader/migrator/pump "
        "(reference-compatible option surface)",
    )
    p.add_argument("--config-file", help="INI config file; CLI flags override it")
    # verbs
    p.add_argument("--create-table-sql", action="store_true",
                   help="Prepare CREATE TABLE SQL statement(s)")
    p.add_argument("--create-table-json-template", action="store_true",
                   help="Prepare CREATE TABLE template(s) as JSON (IPC)")
    p.add_argument("--migrate-table", action="store_true",
                   help="Migrate table(s): copy existing data from the source")
    p.add_argument("--pump-data", action="store_true",
                   help="Pump CDC events into destination snapshots")
    p.add_argument("--profile-table", action="store_true",
                   help="Profile discovered tables (row/null/distinct/"
                   "min/max per column) and, when a landed destination "
                   "exists, report schema drift vs it")
    p.add_argument("--curate-data", action="store_true",
                   help="Curate an LLM document corpus (--src-parquet-dir) "
                   "through the gates + dedup + decontamination pipeline; "
                   "survivors land under --dst-parquet-dir")
    p.add_argument("--curation-report", action="store_true",
                   help="Read-only ops report over a landed curation "
                   "state (--curation-state): per-table growth plus "
                   "per-modality duplication rates from the landed "
                   "fingerprint tables — no media decode, no corpus scan")
    p.add_argument("--with-create-database", action="store_true",
                   help="Prepend CREATE DATABASE to each CREATE TABLE")
    p.add_argument("--dry", action="store_true",
                   help="Dry mode: print planned actions, change nothing")
    p.add_argument("--log-level", default="WARN")
    # source
    p.add_argument("--src-host")
    p.add_argument("--src-port", type=int, default=3306)
    p.add_argument("--src-user", default="root")
    p.add_argument("--src-password", default="")
    p.add_argument("--src-schemas", help="comma-separated databases")
    p.add_argument("--src-tables", help="comma-separated tables")
    p.add_argument("--src-tables-prefixes", help="comma-separated prefixes")
    p.add_argument("--src-tables-where-clauses",
                   help="comma-separated WHERE clauses, positionally paired "
                   "with --src-tables")
    p.add_argument("--src-file", help="CSV source file")
    p.add_argument("--src-parquet-dir", help="landed-parquet source directory")
    p.add_argument("--src-partition-column",
                   help="numeric column for parallel JDBC range scan")
    p.add_argument("--src-lower-bound", type=int)
    p.add_argument("--src-upper-bound", type=int)
    p.add_argument("--num-partitions", type=int, default=8)
    # destination
    p.add_argument("--dst-parquet-dir", help="parquet destination root")
    p.add_argument("--dst-file", help="CSV destination")
    p.add_argument("--dst-host")
    p.add_argument("--dst-port", type=int, default=3306)
    p.add_argument("--dst-user", default="root")
    p.add_argument("--dst-password", default="")
    p.add_argument("--dst-schema")
    p.add_argument("--dst-table")
    p.add_argument("--dst-table-prefix")
    p.add_argument("--dst-distribute", action="store_true")
    p.add_argument("--dst-create-table", action="store_true",
                   help="execute the generated DDL against the Spark catalog")
    # column policy
    p.add_argument("--column-skip", nargs="*", default=None)
    p.add_argument("--column-default-value", nargs="*", default=None,
                   help="column=value pairs")
    # pump
    p.add_argument("--cdc-dir", help="CDC event stream directory (JSON files)")
    p.add_argument("--binlog-position-file", dest="checkpoint_dir",
                   help="stream checkpoint dir (binlog-position analogue)")
    p.add_argument("--pump-key-columns", help="comma-separated snapshot key columns")
    p.add_argument("--snapshot-root", help="snapshot destination root")
    p.add_argument("--mempool-max-events-num", type=int, default=None,
                   help="maxFilesPerTrigger analogue")
    p.add_argument("--mempool-max-flush-interval", type=float, default=None,
                   help="processingTime trigger seconds")
    p.add_argument("--pump-available-now", action="store_true",
                   help="drain existing events then stop (no --src-wait)")
    # curation
    p.add_argument("--curation-config",
                   help="JSON file of CurationConfig keyword arguments")
    p.add_argument("--curation-state",
                   help="CurationState directory: run INCREMENTALLY against "
                   "the landed history (and append the kept batch)")
    p.add_argument("--benchmark-parquet-dir",
                   help="benchmark/eval corpus for decontamination")
    p.add_argument("--curation-text-column", default="text")
    p.add_argument("--curation-id-column", default="doc_id")
    p.add_argument("--curation-stream-checkpoint",
                   help="run curate-data as a STREAM over --src-parquet-dir "
                   "(drain existing files then stop; resumable via this "
                   "checkpoint dir); requires --curation-state")
    p.add_argument("--curation-epoch", type=int,
                   help="batch tag for RETRYABLE increment runs: rerunning "
                   "the same batch with the same --curation-epoch/--curation"
                   "-run-id excludes its own prior state append from the "
                   "history joins (without it a rerun sees every doc as a "
                   "dup of its own landed fingerprints)")
    p.add_argument("--curation-run-id",
                   help="run scope for --curation-epoch (free-form; e.g. a "
                   "pipeline run identifier)")
    return p


def _layer_config_file(path: str, args: argparse.Namespace) -> None:
    """INI file fills any value still at its parser default — CLI wins,
    same layering as the reference (clioptions.py:785-800).

    Values are coerced by the option's REGISTERED type and nargs (not by
    the default's runtime type, which mis-typed every option whose
    default is None): boolean flags via getboolean, ``nargs='*'`` list
    options via CSV split, typed scalars via the argparse ``type``
    callable."""
    ini = configparser.ConfigParser()
    read = ini.read(path)
    if not read:
        raise FileNotFoundError(path)
    parser = build_parser()
    actions: dict[str, argparse.Action] = {}
    for a in parser._actions:
        actions[a.dest] = a
        for opt in a.option_strings:  # INI keys use the option spelling
            actions[opt.lstrip("-").replace("-", "_")] = a
    for section in ini.sections():
        for key, value in ini.items(section):
            action = actions.get(key.replace("-", "_"))
            if action is None or not hasattr(args, action.dest):
                continue
            if getattr(args, action.dest) != parser.get_default(action.dest):
                continue  # explicitly set on the CLI
            if isinstance(action, argparse._StoreTrueAction):
                setattr(args, action.dest, ini.getboolean(section, key))
            elif action.nargs in ("*", "+"):
                setattr(args, action.dest, _split_csv(value))
            elif action.type is not None:
                setattr(args, action.dest, action.type(value))
            else:
                setattr(args, action.dest, value)


def parse_config(argv: list[str] | None = None) -> AppConfig:
    args = build_parser().parse_args(argv)
    if args.config_file:
        _layer_config_file(args.config_file, args)
    skip = args.column_skip
    if skip and len(skip) == 1 and "," in skip[0]:
        skip = _split_csv(skip[0])
    return AppConfig(
        create_table_sql=args.create_table_sql,
        create_table_json=args.create_table_json_template,
        migrate_table=args.migrate_table,
        pump_data=args.pump_data,
        profile_table=args.profile_table,
        curate_data=args.curate_data,
        curation_report=args.curation_report,
        with_create_database=args.with_create_database,
        dry=args.dry,
        log_level=args.log_level,
        src=SourceConfig(
            host=args.src_host,
            port=args.src_port,
            user=args.src_user,
            password=args.src_password,
            schemas=_split_csv(args.src_schemas),
            tables=_split_csv(args.src_tables),
            tables_prefixes=_split_csv(args.src_tables_prefixes),
            tables_where_clauses=_split_csv(args.src_tables_where_clauses),
            file=args.src_file,
            parquet_dir=args.src_parquet_dir,
            partition_column=args.src_partition_column,
            lower_bound=args.src_lower_bound,
            upper_bound=args.src_upper_bound,
            num_partitions=args.num_partitions,
        ),
        dst=DestConfig(
            parquet_dir=args.dst_parquet_dir,
            file=args.dst_file,
            host=args.dst_host,
            port=args.dst_port,
            user=args.dst_user,
            password=args.dst_password,
            schema=args.dst_schema,
            table=args.dst_table,
            table_prefix=args.dst_table_prefix,
            distribute=args.dst_distribute,
            create_table=args.dst_create_table,
        ),
        columns=ColumnPolicy(
            skip=skip or [],
            defaults=_parse_kv_pairs(args.column_default_value),
        ),
        pump=PumpConfig(
            cdc_dir=args.cdc_dir,
            checkpoint_dir=args.checkpoint_dir,
            key_cols=_split_csv(args.pump_key_columns),
            snapshot_root=args.snapshot_root,
            max_files_per_trigger=args.mempool_max_events_num,
            flush_interval_secs=args.mempool_max_flush_interval,
            available_now=args.pump_available_now,
        ),
        curate=CurateConfig(
            config_file=args.curation_config,
            state_dir=args.curation_state,
            benchmark_dir=args.benchmark_parquet_dir,
            text_col=args.curation_text_column,
            id_col=args.curation_id_column,
            stream_checkpoint=args.curation_stream_checkpoint,
            epoch_id=args.curation_epoch,
            run_id=args.curation_run_id,
        ),
    )
