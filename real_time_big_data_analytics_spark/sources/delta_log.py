"""Delta Lake transaction log — the public delta-io PROTOCOL.md
subset that gives parquet files table semantics: an append-only
``_delta_log/`` of newline-delimited JSON commit files whose replay
reconstructs any table version (snapshot isolation + time travel).

Why it exists: at 100 TB a directory of parquet files is not a table —
concurrent writers, partial failures, and compaction all need an
atomic commit point, and that is exactly what the log provides (the
last committed ``%020d.json`` IS the table state; everything else is
dead files awaiting vacuum). The lakehouse formats the reference era
fed from Kafka land on are built on this mechanism.

Implemented subset (disclosed):
- actions: ``protocol``, ``metaData``, ``add``, ``remove``,
  ``commitInfo`` — the complete v1-reader action set for an
  unpartitioned table;
- replay: versions applied in order; within the active set a path's
  LAST action wins (an ``add`` after ``remove`` re-adds);
- time travel: replay stops at the requested version;
- checkpoints (round 8): parquet checkpoint + ``_last_checkpoint``
  pointer, O(tail) replay, log cleanup of covered commits, honest
  refusal of time travel behind an expired tail; round 9 adds
  MULTI-PART checkpoints (``{v}.checkpoint.{i}.{n}.parquet`` +
  ``"parts"`` in the pointer, partial-parts refused) and checkpoint
  roll-forward after cleanup;
- CDF-style incremental scan (round 8): per-commit insert/delete row
  feed from the dataChange adds/removes;
- partition pruning on ``partitionValues`` (round 9): metadata-only
  file selection + typed literal reconstruction of partition columns;
- DELETION VECTORS (round 9/10, sources/delta_dv.py): inline ("i")
  descriptors — Z85-encoded 64-bit roaring bitmaps — plus SIDECAR
  storage (round 10): relative "u" (UUID-named ``deletion_vector_*.
  bin`` files, optional random prefix) and absolute "p" descriptors,
  all applied at scan time via ONE native parquet
  ``_metadata.(file_path, row_index)`` anti-join (bitmaps decoded
  executor-side), so row-level deletes rewrite zero data bytes;
  checkpoints persist the descriptor in the add struct (ADVICE r9);
- COLUMN MAPPING, name AND id mode (round 9/10): logical->physical
  indirection via the delta.columnMapping.* field metadata; renames
  are metadata-only commits. Name mode resolves physical column
  names; id mode resolves parquet FIELD IDS read from each file's
  own footer (file column names are immaterial, per the spec; the
  session-global ``spark.sql.parquet.fieldId.read.enabled`` conf is
  deliberately NOT touched — see ``read_snapshot``). Both compose
  with partitioned tables: ``partitionValues`` key by physical name;
- CHECK CONSTRAINTS + GENERATED COLUMNS (round 11,
  ``append_with_constraints``): ``delta.constraints.*`` enforced at
  commit in one aggregate pass — a violating append is refused WHOLE
  (no files, no commit); ``delta.generationExpression`` columns are
  materialized when omitted and verified when provided. This empties
  the module's previously-disclosed not-implemented list of v2
  writer features.

No foreign delta reader exists in the sandbox (no delta-spark JAR, no
duckdb delta extension — probed in tests/test_delta_log.py), so the
validation is the same pattern as the kafka wire path: spec-shaped
bytes pinned by pytest, and an oracle-checked registry query
(``s_delta_time_travel``) whose hash breaks if replay mis-handles one
add or remove at any version.
"""

from __future__ import annotations

import json
import os

PROTOCOL_ACTION = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def _commit_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, "_delta_log", f"{version:020d}.json")


def write_commit(table_dir: str, version: int, actions: list[dict]) -> str:
    """Atomically publish one commit: newline-delimited JSON actions
    under ``_delta_log/{version:020d}.json``. Refuses to overwrite an
    existing version — the mutual-exclusion rule that makes the log a
    commit point (real implementations get this from atomic
    put-if-absent on the object store).

    The put-if-absent is ``os.link(tmp, path)``: the kernel makes the
    link creation atomic and it fails with EEXIST when the version
    already exists, so two genuinely concurrent writers cannot both
    win — the loser gets FileExistsError even if both raced past any
    earlier existence check (a check-then-replace would silently
    clobber the first committer; see tests/test_delta_log.py's
    multi-process race)."""
    path = _commit_path(table_dir, version)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.inprogress-{os.getpid()}"
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a, separators=(",", ":")) + "\n")
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)  # atomic put-if-absent: EEXIST on loss
    except FileExistsError:
        raise FileExistsError(
            f"version {version} already committed: {path}"
        ) from None
    finally:
        os.unlink(tmp)
    return path


def commit_with_retry(
    table_dir: str,
    actions: list[dict],
    *,
    read_version: int | None = None,
    max_attempts: int = 10,
) -> int:
    """Optimistic-concurrency commit — the real Delta writer protocol:
    the writer derived ``actions`` from the table state at
    ``read_version`` (default: the current head — a blind append that
    resolved nothing from a snapshot); commits that land between that
    snapshot and the eventual write are CONFLICT-CHECKED, and the
    put-if-absent retries at the new head when it loses the race.
    Blind appends never conflict (the common case); a remove conflicts
    with an intervening remove of the same path (a concurrent
    delete/compaction resolved the same file from what is now stale
    state) and is refused rather than silently double-applied.
    Returns the committed version."""
    my_removes = {a["remove"]["path"] for a in actions if "remove" in a}

    def current_head() -> int:
        # the head is max(JSON tail, checkpoint): after log cleanup the
        # checkpoint may be the ONLY evidence of committed versions —
        # a JSON-only head would re-commit (and corrupt) version 0
        versions = log_versions(table_dir)
        cp = read_last_checkpoint(table_dir)
        return max(
            versions[-1] if versions else -1,
            cp["version"] if cp else -1,
        )

    head = current_head()
    if read_version is None:
        read_version = head

    def check_conflicts(lo: int, hi: int) -> None:
        if not my_removes:
            return
        for v in range(lo, hi + 1):
            if not os.path.exists(_commit_path(table_dir, v)):
                # log cleanup expired the commit this writer must
                # conflict-check against — refuse honestly instead of
                # crashing (or worse, committing unchecked)
                raise ValueError(
                    f"{table_dir}: cannot conflict-check remove against "
                    f"expired commit v{v} — refresh read_version past "
                    "the checkpoint and re-derive the actions"
                )
            with open(_commit_path(table_dir, v)) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    action = json.loads(line)
                    if (
                        "remove" in action
                        and action["remove"]["path"] in my_removes
                    ):
                        raise ValueError(
                            f"concurrent remove of "
                            f"{action['remove']['path']} in v{v} — "
                            "refusing to double-apply"
                        ) from None

    check_conflicts(read_version + 1, head)
    target = head + 1
    for _ in range(max_attempts):
        try:
            write_commit(table_dir, target, actions)
            return target
        except FileExistsError:
            new_head = current_head()
            check_conflicts(target, new_head)
            target = new_head + 1
    raise ValueError(
        f"{table_dir}: lost the commit race {max_attempts} times"
    )


class CheckConstraintViolation(ValueError):
    """Raised when an append would commit rows that violate a CHECK
    constraint or disagree with a generated column's expression.
    Carries ``{label: violating_row_count}`` so callers can audit
    exactly what was refused."""

    def __init__(self, violations: dict[str, int]):
        self.violations = dict(violations)
        super().__init__(
            "commit refused: "
            + ", ".join(
                f"{k} ({v} rows)" for k, v in sorted(violations.items())
            )
        )


def append_with_constraints(
    spark, table_dir: str, df, tag: str, read_version: int | None = None
) -> int:
    """Writer-side enforcement of the last two delta protocol v2
    writer features on this module's disclosed list (round 11,
    VERDICT r10 ask #3), per PROTOCOL.md:

    - **CHECK constraints** (``delta.constraints.<name>`` in the table
      configuration, legacy minWriterVersion 3): every constraint
      expression must not evaluate to FALSE on any appended row (NULL
      passes, the SQL CHECK convention). One violating row anywhere
      and the WHOLE append is refused — no data files written, no
      commit, the log byte-identical to before.
    - **Generated columns** (``delta.generationExpression`` in a
      field's schema metadata, legacy minWriterVersion 4): a column
      the writer materializes from its expression when the incoming
      frame omits it, and VERIFIES (null-safe equality) when the
      frame provides it — a provided value disagreeing with the
      expression is refused like a constraint violation.

    All validations run in ONE aggregate pass over ``df`` (a single
    Spark job however many constraints exist — at 100 TB you cannot
    afford a scan per constraint), and files are written only after
    the pass comes back clean. Returns the committed version."""
    from pyspark.sql import functions as F

    snap = replay(table_dir)
    meta = snap["metadata"]
    schema_json = json.loads(meta["schemaString"])
    cfg = meta.get("configuration") or {}

    checks: list[tuple[str, object]] = []  # (label, violation bool col)
    for f in schema_json["fields"]:
        gen = (f.get("metadata") or {}).get("delta.generationExpression")
        if not gen:
            continue
        name = f["name"]
        expr = F.expr(gen)
        if isinstance(f["type"], str):
            expr = expr.cast(f["type"])
        if name in df.columns:
            checks.append(
                (f"generated column {name}", ~expr.eqNullSafe(F.col(name)))
            )
        else:
            df = df.withColumn(name, expr)
    for key in sorted(cfg):
        if not key.startswith("delta.constraints."):
            continue
        cname = key[len("delta.constraints.") :]
        checks.append(
            (
                f"CHECK {cname}",
                # violated ONLY when FALSE: NULL passes (SQL CHECK)
                ~F.coalesce(F.expr(cfg[key]).cast("boolean"), F.lit(True)),
            )
        )
    if checks:
        counts = df.agg(
            *[
                F.sum(F.when(cond, 1).otherwise(0)).alias(f"c{i}")
                for i, (_label, cond) in enumerate(checks)
            ]
        ).collect()[0]
        violations = {
            label: int(counts[i] or 0)
            for i, (label, _cond) in enumerate(checks)
            if counts[i]
        }
        if violations:
            raise CheckConstraintViolation(violations)
    adds = _write_version_files(spark, df, table_dir, tag)
    return commit_with_retry(table_dir, adds, read_version=read_version)


def vacuum(table_dir: str) -> list[str]:
    """Delete data files no longer referenced by the LATEST snapshot —
    the tombstoned dead versions that removes/compactions leave on
    disk. The log (and any checkpoint) is untouched, so replay still
    reconstructs every version's FILE LIST; reading a vacuumed
    version's DATA fails at scan time — the documented vacuum
    trade-off (retention is the real knob; this is retention 0).
    Returns the deleted paths."""
    snap = replay(table_dir)
    active = {os.path.join(table_dir, p) for p in snap["files"]}
    removed = []
    for root, _dirs, files in os.walk(table_dir):
        if "_delta_log" in root:
            continue  # never touch commits or checkpoints
        for fn in files:
            if fn.endswith(".parquet"):
                p = os.path.join(root, fn)
                if p not in active:
                    os.remove(p)
                    removed.append(p)
    return sorted(removed)


def log_versions(table_dir: str) -> list[int]:
    log_dir = os.path.join(table_dir, "_delta_log")
    if not os.path.isdir(log_dir):
        return []
    out = []
    for fn in os.listdir(log_dir):
        if fn.endswith(".json") and len(fn) == 25 and fn[:20].isdigit():
            out.append(int(fn[:20]))
    return sorted(out)


def _apply_commits(table_dir: str, versions: list[int], active: dict, metadata):
    for v in versions:
        with open(_commit_path(table_dir, v)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    metadata = action["metaData"]
                elif "add" in action:
                    active[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    active.pop(action["remove"]["path"], None)
    return active, metadata


def _replay_json(table_dir: str, version: int):
    """JSON-only replay from version 0 (pre-checkpoint path, and the
    state source when WRITING a checkpoint). Contiguity from 0 is
    enforced — a gap means a lost commit, and replaying past it would
    silently time-travel."""
    versions = log_versions(table_dir)
    expect = list(range(version + 1))
    if versions[: len(expect)] != expect:
        raise ValueError(
            f"{table_dir}: log has gaps {versions} — refusing to replay"
        )
    active, metadata = _apply_commits(table_dir, expect, {}, None)
    if metadata is None:
        raise ValueError(f"{table_dir}: no metaData action through v{version}")
    return active, metadata


def replay(table_dir: str, version: int | None = None) -> dict:
    """Reconstruct the table state at ``version`` (default: latest).

    Returns ``{version, metadata, files}`` where ``files`` is the
    sorted list of active data-file paths (relative to the table
    root). With a checkpoint at C <= version, the state loads from the
    checkpoint parquet and only commits C+1..version replay — O(tail)
    regardless of history length, and commits <= C may have been
    cleaned up. Time travel to version < C falls back to JSON-from-0
    and refuses honestly if those commits were expired. Contiguity of
    whatever JSON range is needed is enforced — a gap means a lost
    commit, and replaying past it would silently time-travel."""
    versions = log_versions(table_dir)
    cp = read_last_checkpoint(table_dir)
    newest = max(
        versions[-1] if versions else -1,
        cp["version"] if cp else -1,
    )
    if newest < 0:
        raise ValueError(f"{table_dir}: no _delta_log commits")
    if version is None:
        version = newest
    if version > newest:
        raise ValueError(f"{table_dir}: version {version} not in log")
    if cp is not None and cp["version"] <= version:
        active, metadata = _load_checkpoint(
            table_dir, cp["version"], parts=int(cp.get("parts", 1))
        )
        tail = list(range(cp["version"] + 1, version + 1))
        present = [v for v in versions if cp["version"] < v <= version]
        if present != tail:
            raise ValueError(
                f"{table_dir}: commits after checkpoint {cp['version']} "
                f"have gaps {present} — refusing to replay"
            )
        active, metadata = _apply_commits(table_dir, tail, active, metadata)
    else:
        active, metadata = _replay_json(table_dir, version)
    return {
        "version": version,
        "metadata": metadata,
        "files": sorted(active),
        # raw add actions keyed by path — partitionValues feed pruning
        # and the checkpoint writer; same replayed state, richer view
        "_active": active,
    }


# -- checkpoints (PROTOCOL.md "Checkpoints") ----------------------------
#
# A checkpoint at version N is a parquet file
# ``_delta_log/{N:020d}.checkpoint.parquet`` holding the REPLAYED state
# (one row per action: protocol / metaData / active add), plus the
# ``_last_checkpoint`` pointer ``{"version": N, "size": rows}``. Its
# purpose is replay-acceleration: readers load the checkpoint and apply
# only the JSON tail AFTER it, so commits <= N may be cleaned up (log
# cleanup) without losing any version >= N. Time travel BEFORE the
# checkpoint still needs the cleaned JSON commits and is refused
# honestly — the same contract as the real implementation.


def _checkpoint_path(table_dir: str, version: int) -> str:
    return os.path.join(
        table_dir, "_delta_log", f"{version:020d}.checkpoint.parquet"
    )


def _checkpoint_part_path(
    table_dir: str, version: int, part: int, parts: int
) -> str:
    """Multi-part checkpoint file name per PROTOCOL.md:
    ``{version}.checkpoint.{part}.{parts}.parquet`` (1-based part)."""
    return os.path.join(
        table_dir,
        "_delta_log",
        f"{version:020d}.checkpoint.{part:010d}.{parts:010d}.parquet",
    )


def read_last_checkpoint(table_dir: str) -> dict | None:
    p = os.path.join(table_dir, "_delta_log", "_last_checkpoint")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        cp = json.load(f)
    if "version" not in cp:
        raise ValueError(f"{table_dir}: malformed _last_checkpoint {cp}")
    return cp


def write_checkpoint(table_dir: str, version: int, parts: int = 1) -> str:
    """Replay to ``version`` and publish the checkpoint +
    ``_last_checkpoint`` pointer (tmp + atomic rename, like commits).
    State comes from ``replay`` — existing checkpoint + JSON tail — so
    checkpoints ROLL FORWARD after log cleanup expired the early
    commits (building from JSON-version-0 would refuse forever once
    cleanup ran, and the JSON tail would grow unboundedly).
    Metadata-scale: one parquet row per active file — written with
    pyarrow directly, the same way real writers use a parquet library
    for the log (the DATA files still go through Spark's writer).

    ``parts > 1`` writes a MULTI-PART checkpoint (PROTOCOL.md:
    ``{v}.checkpoint.{i}.{n}.parquet`` + ``"parts"`` in
    ``_last_checkpoint``): the add actions split contiguously across
    parts (protocol/metaData ride part 1) — at 100 TB a snapshot has
    millions of active files and a single checkpoint file becomes the
    write/read bottleneck; parts parallelize both sides."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    snap = replay(table_dir, version)
    snap_active, metadata = snap["_active"], snap["metadata"]
    # deletionVector rides the checkpoint add struct (PROTOCOL.md
    # checkpoint schema) — dropping it would silently RESURRECT every
    # logically deleted row once log cleanup expired the JSON commit
    # that carried the descriptor (ADVICE r9, high)
    dv_t = pa.struct(
        [
            ("storageType", pa.string()),
            ("pathOrInlineDv", pa.string()),
            ("offset", pa.int32()),
            ("sizeInBytes", pa.int32()),
            ("cardinality", pa.int64()),
        ]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("deletionVector", dv_t),
        ]
    )
    fmt_t = pa.struct(
        [
            ("provider", pa.string()),
            ("options", pa.map_(pa.string(), pa.string())),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("format", fmt_t),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    proto_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    adds = [snap_active[p] for p in sorted(snap_active)]
    n = len(adds) + 2
    fmt = metadata.get("format", {"provider": "parquet", "options": {}})
    meta_row = {
        "id": metadata["id"],
        "format": {
            "provider": fmt.get("provider", "parquet"),
            "options": list((fmt.get("options") or {}).items()),
        },
        "schemaString": metadata["schemaString"],
        "partitionColumns": metadata["partitionColumns"],
        "configuration": list((metadata.get("configuration") or {}).items()),
        "createdTime": metadata["createdTime"],
    }

    def _add_row(a: dict) -> dict:
        dv = a.get("deletionVector")
        return {
            "path": a["path"],
            "partitionValues": list(a.get("partitionValues", {}).items()),
            "size": a["size"],
            "modificationTime": a["modificationTime"],
            "dataChange": a["dataChange"],
            "deletionVector": (
                {
                    "storageType": dv["storageType"],
                    "pathOrInlineDv": dv["pathOrInlineDv"],
                    "offset": dv.get("offset"),
                    "sizeInBytes": dv["sizeInBytes"],
                    "cardinality": dv["cardinality"],
                }
                if dv
                else None
            ),
        }

    def _cp_table(with_header: bool, part_adds: list):
        hdr = 2 if with_header else 0
        rows = hdr + len(part_adds)
        return pa.table(
            {
                "protocol": pa.array(
                    ([PROTOCOL_ACTION["protocol"], None] if with_header else [])
                    + [None] * len(part_adds),
                    proto_t,
                ),
                "metaData": pa.array(
                    ([None, meta_row] if with_header else [])
                    + [None] * len(part_adds),
                    meta_t,
                ),
                "add": pa.array(
                    [None] * hdr + [_add_row(a) for a in part_adds], add_t
                ),
            }
        )

    if parts <= 1:
        targets = [(_checkpoint_path(table_dir, version), _cp_table(True, adds))]
    else:
        # contiguous split: part i gets adds[i*step:(i+1)*step]; the
        # protocol/metaData header rides part 1 (any distribution is
        # legal — readers take the union of all parts)
        step = -(-len(adds) // parts) if adds else 0
        targets = []
        for i in range(parts):
            chunk = adds[i * step : (i + 1) * step] if step else []
            targets.append(
                (
                    _checkpoint_part_path(table_dir, version, i + 1, parts),
                    _cp_table(i == 0, chunk),
                )
            )
    for path, tbl in targets:
        tmp = f"{path}.inprogress"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    path = targets[0][0]
    ptr = os.path.join(table_dir, "_delta_log", "_last_checkpoint")
    tmp = f"{ptr}.inprogress"
    pointer = {"version": version, "size": n}
    if parts > 1:
        pointer["parts"] = parts
    with open(tmp, "w") as f:
        json.dump(pointer, f)
    os.replace(tmp, ptr)
    return path


def _load_checkpoint(table_dir: str, version: int, parts: int = 1):
    """Checkpoint parquet(s) → (active add dict, metadata dict).
    ``parts > 1`` reads the union of every part file (refusing on a
    missing part — a partial multi-part checkpoint is no checkpoint)."""
    import pyarrow.parquet as pq

    if parts <= 1:
        paths = [_checkpoint_path(table_dir, version)]
    else:
        paths = [
            _checkpoint_part_path(table_dir, version, i + 1, parts)
            for i in range(parts)
        ]
        missing = [p for p in paths if not os.path.exists(p)]
        if missing:
            raise ValueError(
                f"{table_dir}: multi-part checkpoint {version} is missing "
                f"{len(missing)}/{parts} parts — refusing partial state"
            )
    rows = []
    for pth in paths:
        rows.extend(pq.read_table(pth).to_pylist())
    active: dict[str, dict] = {}
    metadata = None
    for r in rows:
        if r.get("metaData"):
            metadata = dict(r["metaData"])
            # pyarrow maps come back as pair lists — restore the JSON
            # action shape so replay()['metadata'] is identical whether
            # it came through the checkpoint or the JSON path
            fmt = dict(metadata.get("format") or {})
            fmt["options"] = dict(fmt.get("options") or [])
            metadata["format"] = fmt
            metadata["configuration"] = dict(
                metadata.get("configuration") or []
            )
        elif r.get("add"):
            a = dict(r["add"])
            a["partitionValues"] = dict(a.get("partitionValues") or [])
            # restore the JSON action shape: adds without a DV carry NO
            # deletionVector key (a None value would change replay()'s
            # _active shape between the checkpoint and JSON paths)
            if a.get("deletionVector") is None:
                a.pop("deletionVector", None)
            else:
                a["deletionVector"] = dict(a["deletionVector"])
            active[a["path"]] = a
    if metadata is None:
        raise ValueError(
            f"{table_dir}: checkpoint {version} carries no metaData"
        )
    return active, metadata


def expire_commits_before_checkpoint(table_dir: str) -> list[int]:
    """Log cleanup: delete JSON commits <= the checkpointed version
    (they are fully covered by the checkpoint). Returns the removed
    versions. Refuses when no checkpoint exists."""
    cp = read_last_checkpoint(table_dir)
    if cp is None:
        raise ValueError(f"{table_dir}: no checkpoint — refusing cleanup")
    removed = []
    for v in log_versions(table_dir):
        if v <= cp["version"]:
            os.remove(_commit_path(table_dir, v))
            removed.append(v)
    return removed


def _cm_physical_names(metadata: dict) -> dict[str, str]:
    """logical -> physical column-name map when column mapping is on
    (empty dict otherwise). With mapping enabled, ``partitionValues``
    keys and (name-mode) data-file columns use PHYSICAL names; the
    schemaString's field names stay logical with the mapping carried
    in the delta.columnMapping.* field metadata."""
    cfg = metadata.get("configuration") or {}
    if cfg.get("delta.columnMapping.mode") in (None, "none"):
        return {}
    fields = json.loads(metadata["schemaString"])["fields"]
    return {
        f["name"]: f["metadata"]["delta.columnMapping.physicalName"]
        for f in fields
    }


def prune_files(
    snap: dict, partition_filter: dict[str, set] | None
) -> dict[str, dict]:
    """Metadata-only partition pruning: filter the snapshot's active
    ``add`` actions by their ``partitionValues`` — the scale lever of
    the log at 100 TB (the reader never even LISTS the data files of
    unselected partitions; pruning cost is O(log metadata), not
    O(table)). ``partition_filter`` maps LOGICAL partition column ->
    allowed string values (partitionValues are strings per
    PROTOCOL.md); under column mapping the filter keys translate to
    the physical names the add actions carry."""
    active = snap["_active"]
    if not partition_filter:
        return active
    part_cols = set(snap["metadata"].get("partitionColumns") or [])
    unknown = set(partition_filter) - part_cols
    if unknown:
        raise ValueError(
            f"not partition columns (have {sorted(part_cols)}): "
            f"{sorted(unknown)}"
        )
    phys = _cm_physical_names(snap["metadata"])
    return {
        p: a
        for p, a in active.items()
        if all(
            (a.get("partitionValues") or {}).get(phys.get(c, c)) in vals
            for c, vals in partition_filter.items()
        )
    }


def read_snapshot(
    spark,
    table_dir: str,
    version: int | None = None,
    partition_filter: dict[str, set] | None = None,
):
    """DataFrame over the table at ``version`` — the replayed active
    file set handed to the native parquet reader (so column pruning /
    predicate pushdown apply exactly as on a plain scan; an empty
    snapshot yields an empty DataFrame with the log's schema).

    With ``partition_filter``, files are pruned from the LOG's
    partitionValues before any scan is planned, and the partition
    columns (not stored in the data files, per Delta's layout) are
    reconstructed as literals per file group — exactly how real Delta
    readers serve partition columns from metadata."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType

    from . import delta_dv

    snap = replay(table_dir, version)
    schema_json = json.loads(snap["metadata"]["schemaString"])
    schema = StructType.fromJson(schema_json)
    part_cols = list(snap["metadata"].get("partitionColumns") or [])
    cfg = snap["metadata"].get("configuration") or {}
    cm_mode = cfg.get("delta.columnMapping.mode")
    if cm_mode in ("none",):
        cm_mode = None
    if cm_mode not in (None, "name", "id"):
        raise ValueError(f"unsupported columnMapping mode {cm_mode!r}")
    phys_of = _cm_physical_names(snap["metadata"]) if cm_mode else {}
    data_fields = [f for f in schema_json["fields"] if f["name"] not in part_cols]
    types = {f.name: f.dataType for f in schema.fields}
    wanted: list[tuple[int, str]] = []
    if cm_mode == "id":
        # id mode: parquet FIELD IDS (not names) are authoritative.
        # Resolution happens HERE, not via the session conf
        # ``spark.sql.parquet.fieldId.read.enabled`` — that conf is
        # session-global and consumed lazily at scan EXECUTION time
        # (probed: the per-read option form returns nulls because
        # ParquetFileFormat overwrites the hadoop conf entry from the
        # SQL conf), so a try/finally restore would break the returned
        # lazy DataFrame and leaving it set leaks id-resolution into
        # every later parquet read in the session (ADVICE r10).
        wanted = [
            (int(f["metadata"]["delta.columnMapping.id"]), f["name"])
            for f in data_fields
        ]
    active = prune_files(snap, partition_filter)
    if not active:
        return spark.createDataFrame([], schema)

    def _id_groups(abs_paths: list[str]) -> dict[tuple, list[str]]:
        """id mode: map field id → physical column name from each
        file's parquet footer (driver-side, the same O(files) order as
        the log replay that produced ``abs_paths``) and group files by
        the resulting name tuple — a table written by one writer has
        one group, i.e. still ONE native pushdown-capable scan. An id
        absent from a file maps to a sentinel name no file carries, so
        the schema'd read serves NULLs for it (schema evolution)."""
        import pyarrow.parquet as papq

        groups: dict[tuple, list[str]] = {}
        for p in abs_paths:
            by_id: dict[int, str] = {}
            for fld in papq.read_schema(p):
                fid = (fld.metadata or {}).get(b"PARQUET:field_id")
                if fid is not None:
                    by_id[int(fid)] = fld.name
            key = tuple(
                by_id.get(fid, f"__delta_absent_{fid}") for fid, _ in wanted
            )
            groups.setdefault(key, []).append(p)
        return groups

    def _scan_logical(abs_paths, attach=None, extra=()):
        """Native scan(s) over ``abs_paths``. id mode resolves physical
        names per file group and aliases to LOGICAL names; name/none
        modes read with the CURRENT metaData schema under physical
        names (``to_logical`` maps name mode afterwards) — reading
        with the metadata schema rather than file inference is what
        makes ADD-COLUMN schema evolution work: files written before
        the column existed serve NULLs for it instead of poisoning
        the scan with the first file's narrower schema (round 11).
        ``attach`` runs on the raw scan BEFORE the id-mode alias
        select so it can still reach ``_metadata``; columns it adds
        are listed in ``extra`` to survive the select."""
        if cm_mode != "id":
            phys_struct = StructType(
                [
                    StructField(
                        phys_of.get(f["name"], f["name"])
                        if cm_mode == "name"
                        else f["name"],
                        types[f["name"]],
                        True,
                    )
                    for f in data_fields
                ]
            )
            df = spark.read.schema(phys_struct).parquet(*sorted(abs_paths))
            return [attach(df) if attach else df]
        parts = []
        groups = _id_groups(abs_paths)
        for key in sorted(groups):
            grp = groups[key]
            phys = StructType(
                [
                    StructField(pname, types[lname], True)
                    for pname, (_fid, lname) in zip(key, wanted)
                ]
            )
            df = spark.read.schema(phys).parquet(*sorted(grp))
            if attach:
                df = attach(df)
            parts.append(
                df.select(
                    *[
                        F.col(pname).alias(lname)
                        for pname, (_fid, lname) in zip(key, wanted)
                    ],
                    *extra,
                )
            )
        return parts

    def read_files(adds: list[dict]):
        """One scan for the plain files + ONE scan and ONE broadcast
        anti-join for ALL deletion-vectored files (ADVICE r9): the
        DV'd files are read together with the native parquet
        ``_metadata`` (file_path, row_index) columns and anti-joined
        against a single deleted-positions relation. The driver ships
        only the DESCRIPTORS (bounded metadata, one per file);
        ``mapInPandas`` decodes each bitmap into (path, row_index)
        rows executor-side — plan size and driver memory stay O(files
        with DVs), not O(files × cardinality), and the join count is
        1 no matter how many files carry DVs."""
        plain = [a["path"] for a in adds if not a.get("deletionVector")]
        dvd = sorted(
            (a for a in adds if a.get("deletionVector")),
            key=lambda a: a["path"],
        )
        parts = []
        if plain:
            parts.extend(
                _scan_logical([os.path.join(table_dir, p) for p in plain])
            )
        if dvd:
            descs = [
                (
                    os.path.abspath(os.path.join(table_dir, a["path"])),
                    json.dumps(a["deletionVector"]),
                )
                for a in dvd
            ]
            tdir = table_dir

            def expand(batches):
                import pandas as pd

                for pdf in batches:
                    paths: list[str] = []
                    rows: list[int] = []
                    for p, dj in zip(pdf["__dv_path"], pdf["__dv_desc"]):
                        for ri in delta_dv.dv_row_indexes(
                            json.loads(dj), table_dir=tdir
                        ):
                            paths.append(p)
                            rows.append(int(ri))
                    yield pd.DataFrame(
                        {"__dv_path": paths, "__dv_ri": rows}
                    )

            deleted = spark.createDataFrame(
                descs, "__dv_path string, __dv_desc string"
            ).mapInPandas(expand, "__dv_path string, __dv_ri bigint")

            def attach(df):
                # normalize the scheme'd PERCENT-ENCODED URI to the
                # plain absolute path the descriptor rows carry:
                # strip "file:///x"/"file:/x" -> "/x", then decode
                # %XX escapes (a table_dir with spaces etc. would
                # otherwise miss every join key and silently
                # resurrect deleted rows — ADVICE r10). url_decode is
                # form-decoding ('+' -> space), so protect literal
                # '+' as %2B first; URIs never use '+' for space.
                return df.withColumn(
                    "__dv_path",
                    F.url_decode(
                        F.regexp_replace(
                            F.regexp_replace(
                                F.col("_metadata.file_path"),
                                "^file:/+",
                                "/",
                            ),
                            r"\+",
                            "%2B",
                        )
                    ),
                ).withColumn("__dv_ri", F.col("_metadata.row_index"))

            for df in _scan_logical(
                [os.path.join(table_dir, a["path"]) for a in dvd],
                attach=attach,
                extra=("__dv_path", "__dv_ri"),
            ):
                parts.append(
                    df.join(
                        F.broadcast(deleted),
                        ["__dv_path", "__dv_ri"],
                        "left_anti",
                    ).drop("__dv_path", "__dv_ri")
                )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def to_logical(df):
        """name mode: the data files store PHYSICAL names; the current
        metaData's schema maps them to logical names — which is what
        makes renames a metadata-only commit (the same bytes read back
        under the new logical name). id mode already resolved by field
        id at the scan."""
        if cm_mode != "name":
            return df
        return df.select(
            *[F.col(phys_of[f["name"]]).alias(f["name"]) for f in data_fields]
        )

    if not part_cols:
        return to_logical(read_files(list(active.values())))
    # group pruned files by partition tuple; reconstruct the partition
    # columns as typed literals (one scan per partition value set, all
    # unioned — each group is still a native pushdown-capable scan).
    # partitionValues key by PHYSICAL name under column mapping.
    by_vals: dict[tuple, list[dict]] = {}
    for p in sorted(active):
        pv = active[p].get("partitionValues") or {}
        key = tuple(pv[phys_of.get(c, c)] for c in part_cols)
        by_vals.setdefault(key, []).append(active[p])
    types = {f.name: f.dataType for f in schema.fields}
    out = None
    for key in sorted(by_vals):
        df = to_logical(read_files(by_vals[key]))
        for c, raw in zip(part_cols, key):
            df = df.withColumn(c, F.lit(raw).cast(types[c]))
        df = df.select(*[f.name for f in schema.fields])
        out = df if out is None else out.unionByName(df)
    return out


# -- staging for the registry query ------------------------------------

_DELTA_DIRS: dict[str, str] = {}

# fixed timestamps: the staged log is byte-reproducible per corpus
_T0 = 1704067200000


def _write_version_files(spark, df, table_dir: str, tag: str) -> list[dict]:
    """Write one version's rows as parquet part files under
    ``files_{tag}/`` and return their ``add`` actions (path, size,
    dataChange) — the real writer sequence: data files first, then the
    commit that makes them visible."""
    sub = f"files_{tag}"
    out = os.path.join(table_dir, sub)
    df.write.mode("overwrite").parquet(out)
    adds = []
    for fn in sorted(os.listdir(out)):
        if fn.endswith(".parquet"):
            rel = f"{sub}/{fn}"
            adds.append(
                {
                    "add": {
                        "path": rel,
                        "partitionValues": {},
                        "size": os.path.getsize(os.path.join(out, fn)),
                        "modificationTime": _T0,
                        "dataChange": True,
                    }
                }
            )
    return adds


def _build_three_version_table(spark, sf_dir: str, stage_dir: str, tag: str) -> None:
    """The shared three-version build:

    - v0: rows with event_id % 3 == 0
    - v1: append rows with event_id % 3 == 1
    - v2: REMOVE the v0 files and add a compacted rewrite of the same
      %3==0 rows plus the %3==2 rows (the overwrite/compaction
      pattern — old files stay on disk as dead versions until vacuum)

    So: v1 reads %3 in (0,1); v2 (latest) reads all rows but through
    DIFFERENT files than v0 wrote. Replay must honor both the adds
    and the remove at each version or the aggregates diverge."""
    from pyspark.sql import functions as F

    from .tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    m0 = events.filter(F.col("event_id") % 3 == 0)
    m1 = events.filter(F.col("event_id") % 3 == 1)
    m2 = events.filter(F.col("event_id") % 3 == 2)

    adds_v0 = _write_version_files(spark, m0, stage_dir, "v0")
    meta = {
        "metaData": {
            "id": f"rtba-{tag}",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": events.schema.json(),
            "partitionColumns": [],
            "configuration": {},
            "createdTime": _T0,
        }
    }
    write_commit(stage_dir, 0, [PROTOCOL_ACTION, meta] + adds_v0)

    adds_v1 = _write_version_files(spark, m1, stage_dir, "v1")
    write_commit(stage_dir, 1, adds_v1)

    removes = [
        {
            "remove": {
                "path": a["add"]["path"],
                "deletionTimestamp": _T0,
                "dataChange": True,
            }
        }
        for a in adds_v0
    ]
    # compacted rewrite of the removed rows + the new modulus class
    adds_v2 = _write_version_files(
        spark, m0.unionByName(m2).coalesce(4), stage_dir, "v2"
    )
    write_commit(stage_dir, 2, removes + adds_v2)


def _stage_table(spark, sf_dir: str, kind: str, post_build=None, builder=None) -> str:
    """Crash-idempotent staging shared by the delta stagers: build the
    WHOLE table (data files + all commits + any ``post_build`` step,
    e.g. checkpointing) in a fresh scratch dir, then atomically rename
    it into place. A prior run that died mid-build leaves either a
    partial table_dir (a pre-rename code generation — delete it; its
    final marker is absent by the guard below) or an orphaned scratch
    dir (harmless, unique name), never a wedged half-committed log
    that FileExistsError would then refuse to rebuild forever
    (ADVICE r7)."""
    import hashlib
    import shutil
    import tempfile
    import uuid

    st = os.stat(os.path.join(sf_dir, "events.parquet"))
    tag = hashlib.md5(
        f"{kind}|{sf_dir}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    cache_key = f"{kind}|{tag}"
    if cache_key in _DELTA_DIRS:
        return _DELTA_DIRS[cache_key]
    table_dir = os.path.join(tempfile.gettempdir(), f"rtba_{kind}_{tag}")
    done_marker = os.path.join(table_dir, "_staging_complete")
    if not os.path.exists(done_marker):
        if os.path.exists(table_dir):
            shutil.rmtree(table_dir)
        stage_dir = f"{table_dir}.staging-{uuid.uuid4().hex[:12]}"
        (builder or _build_three_version_table)(spark, sf_dir, stage_dir, tag)
        if post_build is not None:
            post_build(stage_dir)
        with open(os.path.join(stage_dir, "_staging_complete"), "w") as f:
            f.write(tag)
        try:
            os.rename(stage_dir, table_dir)
        except OSError:
            # a concurrent stager renamed first; its table is complete
            shutil.rmtree(stage_dir, ignore_errors=True)
            if not os.path.exists(done_marker):
                raise
    _DELTA_DIRS[cache_key] = table_dir
    return table_dir


def stage_events_as_delta(spark, sf_dir: str) -> str:
    """The plain three-version table (see _build_three_version_table),
    staged once per corpus fingerprint."""
    return _stage_table(spark, sf_dir, "delta")


def changes_between(spark, table_dir: str, start_version: int, end_version: int):
    """CDF-style incremental scan: the row-level changes committed in
    versions ``start_version..end_version`` (both inclusive, like
    Delta's ``startingVersion``): every ``dataChange`` add contributes
    its file's rows as ``change_type='insert'`` and every
    ``dataChange`` remove contributes the removed file's rows as
    ``change_type='delete'``, each stamped with ``commit_version``.
    This is the file-granularity change feed the log ALREADY encodes —
    an incremental consumer reads only the commits since its last
    position plus the files they touch, never the whole table (the
    point of a log at 100 TB: downstream refresh cost is O(changed
    bytes), not O(table)). Removed files are readable until vacuum,
    exactly why tombstoned files stay on disk."""
    from functools import reduce

    from pyspark.sql import functions as F

    versions = log_versions(table_dir)
    want = list(range(start_version, end_version + 1))
    missing = [v for v in want if v not in versions]
    if missing:
        raise ValueError(
            f"{table_dir}: commits {missing} absent — CDF needs the JSON "
            "actions for every version in the requested range"
        )
    parts = []
    for v in want:
        adds, removes = [], []
        with open(_commit_path(table_dir, v)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action and action["add"].get("dataChange"):
                    adds.append(os.path.join(table_dir, action["add"]["path"]))
                elif "remove" in action and action["remove"].get("dataChange"):
                    removes.append(
                        os.path.join(table_dir, action["remove"]["path"])
                    )
        for paths, kind in ((adds, "insert"), (removes, "delete")):
            if paths:
                parts.append(
                    spark.read.parquet(*paths)
                    .withColumn("commit_version", F.lit(v).cast("bigint"))
                    .withColumn("change_type", F.lit(kind))
                )
    if not parts:
        raise ValueError(f"{table_dir}: no dataChange actions in range")
    return reduce(lambda a, b: a.unionByName(b), parts)


def stage_events_as_delta_checkpointed(spark, sf_dir: str) -> str:
    """The same three-version table, then ``write_checkpoint`` at
    version 1 — MULTI-PART (2 parts, round 9) — and LOG CLEANUP of
    commits 0-1: any replay of version >= 1 MUST come through the
    checkpoint parts (the JSON history behind it no longer exists),
    which is exactly what the ``s_delta_checkpoint_replay`` oracle
    then hash-checks — one lost/duplicated part row and the version
    aggregates diverge."""

    def post_build(stage_dir: str) -> None:
        write_checkpoint(stage_dir, 1, parts=2)
        expire_commits_before_checkpoint(stage_dir)

    # kind "deltacp2": the r9 multi-part staging must not reuse a
    # cached single-part table from an earlier round
    return _stage_table(spark, sf_dir, "deltacp2", post_build=post_build)


def delta_checkpoint_replay(spark, sf_dir: str):
    """``s_delta_checkpoint_replay`` — versions 1 and 2 of the
    checkpointed table, replayed AFTER log cleanup removed the JSON
    commits the checkpoint covers: v1 is pure checkpoint state, v2 is
    checkpoint + the one-tail commit (O(tail) replay). Hash-exact vs
    the oracle's per-version modulus definitions; a checkpoint that
    dropped/duplicated one add, mis-decoded the parquet state, or
    mis-applied the tail diverges."""
    from pyspark.sql import functions as F

    table_dir = stage_events_as_delta_checkpointed(spark, sf_dir)
    out = None
    for v in (1, 2):
        df = (
            read_snapshot(spark, table_dir, version=v)
            .agg(
                F.count("*").alias("n"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(F.sum("value"), 2).alias("total_value"),
                F.min("event_id").alias("min_event_id"),
                F.max("event_id").alias("max_event_id"),
            )
            .withColumn("version", F.lit(v).cast("bigint"))
            .select(
                "version", "n", "n_users", "total_value",
                "min_event_id", "max_event_id",
            )
        )
        out = df if out is None else out.unionByName(df)
    return out


DELTA_CHECKPOINT_REPLAY_SQL = """
WITH v(version, m0, m1, m2) AS (
    VALUES (CAST(1 AS BIGINT), true, true,  false),
           (CAST(2 AS BIGINT), true, true,  true)
)
SELECT v.version,
       count(*) AS n,
       count(DISTINCT e.user_id) AS n_users,
       round(sum(e.value), 2) AS total_value,
       min(e.event_id) AS min_event_id,
       max(e.event_id) AS max_event_id
FROM v JOIN events e
  ON (e.event_id % 3 = 0 AND v.m0)
  OR (e.event_id % 3 = 1 AND v.m1)
  OR (e.event_id % 3 = 2 AND v.m2)
GROUP BY v.version
ORDER BY v.version
"""


def delta_cdf_changes(spark, sf_dir: str):
    """``s_delta_cdf_changes`` — the full change feed of the staged
    table (commits 0..2) aggregated per (commit_version, change_type).
    The oracle replays the SET-DIFFERENCE definition of each commit:
    v0 inserts %3==0, v1 inserts %3==1, v2 deletes %3==0 and re-inserts
    %3 IN (0,2) (the compaction rewrite) — a change feed that loses,
    duplicates, or mislabels one file's rows breaks the hash."""
    from pyspark.sql import functions as F

    table_dir = stage_events_as_delta(spark, sf_dir)
    ch = changes_between(spark, table_dir, 0, 2)
    return (
        ch.groupBy("commit_version", "change_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
        .orderBy("commit_version", "change_type")
    )


DELTA_CDF_CHANGES_SQL = """
WITH ch AS (
  SELECT CAST(0 AS BIGINT) AS commit_version, 'insert' AS change_type, e.*
  FROM events e WHERE e.event_id % 3 = 0
  UNION ALL
  SELECT CAST(1 AS BIGINT), 'insert', e.* FROM events e WHERE e.event_id % 3 = 1
  UNION ALL
  SELECT CAST(2 AS BIGINT), 'delete', e.* FROM events e WHERE e.event_id % 3 = 0
  UNION ALL
  SELECT CAST(2 AS BIGINT), 'insert', e.* FROM events e WHERE e.event_id % 3 IN (0, 2)
)
SELECT commit_version, change_type,
       count(*) AS n,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 2) AS total_value,
       min(event_id) AS min_event_id,
       max(event_id) AS max_event_id
FROM ch GROUP BY commit_version, change_type
ORDER BY commit_version, change_type
"""


def delta_time_travel(spark, sf_dir: str):
    """``s_delta_time_travel`` — aggregate the SAME staged table at
    every version; one wrong add/remove during any replay and that
    version's row diverges from the oracle's modulus definition."""
    from pyspark.sql import functions as F

    table_dir = stage_events_as_delta(spark, sf_dir)
    out = None
    for v in (0, 1, 2):
        df = (
            read_snapshot(spark, table_dir, version=v)
            .agg(
                F.count("*").alias("n"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(F.sum("value"), 2).alias("total_value"),
                F.min("event_id").alias("min_event_id"),
                F.max("event_id").alias("max_event_id"),
            )
            .withColumn("version", F.lit(v).cast("bigint"))
            .select(
                "version", "n", "n_users", "total_value",
                "min_event_id", "max_event_id",
            )
        )
        out = df if out is None else out.unionByName(df)
    return out


def _build_partitioned_table(spark, sf_dir: str, stage_dir: str, tag: str) -> None:
    """Hive-layout partitioned staging: events partitioned by
    ``event_type``, each partition written as EXACTLY two parquet
    files (repartition(2)) with the partition column dropped from the
    data files and carried in the add action's ``partitionValues`` —
    Delta's actual layout, which is what makes metadata-only pruning
    possible. One commit (v0) with partitionColumns=["event_type"]."""
    from pyspark.sql import functions as F

    from .tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    etypes = [
        r[0]
        for r in events.select("event_type").distinct().orderBy("event_type").collect()
    ]  # bounded: one row per event type (5 at every SF)
    adds = []
    for et in etypes:
        sub = f"files_pt/event_type={et}"
        out = os.path.join(stage_dir, sub)
        (
            events.filter(F.col("event_type") == et)
            .drop("event_type")
            .repartition(2)
            .write.mode("overwrite")
            .parquet(out)
        )
        for fn in sorted(os.listdir(out)):
            if fn.endswith(".parquet"):
                adds.append(
                    {
                        "add": {
                            "path": f"{sub}/{fn}",
                            "partitionValues": {"event_type": et},
                            "size": os.path.getsize(os.path.join(out, fn)),
                            "modificationTime": _T0,
                            "dataChange": True,
                        }
                    }
                )
    meta = {
        "metaData": {
            "id": f"rtba-pt-{tag}",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": events.schema.json(),
            "partitionColumns": ["event_type"],
            "configuration": {},
            "createdTime": _T0,
        }
    }
    write_commit(stage_dir, 0, [PROTOCOL_ACTION, meta] + adds)


def stage_events_as_delta_partitioned(spark, sf_dir: str) -> str:
    return _stage_table(
        spark, sf_dir, "deltapt", builder=_build_partitioned_table
    )


def delta_partition_prune(spark, sf_dir: str):
    """``s_delta_partition_prune`` — read the partitioned table through
    a partition filter (event_type IN ('click','purchase')) and emit
    per-type aggregates PLUS the pruning audit: files scanned vs files
    total, both taken from the log's add actions (the
    ``dq_zorder_pruning_audit`` discipline). The oracle reproduces the
    aggregates from the raw events and the file counts from the
    staging invariant (exactly 2 files per partition) — a reader that
    scans unselected partitions, drops a selected file, or
    reconstructs the partition column wrong diverges."""
    from pyspark.sql import functions as F

    table_dir = stage_events_as_delta_partitioned(spark, sf_dir)
    snap = replay(table_dir)
    sel = {"click", "purchase"}
    pruned = prune_files(snap, {"event_type": sel})
    files_total = len(snap["_active"])
    files_scanned = len(pruned)
    per_part: dict[str, int] = {}
    for a in pruned.values():
        et = a["partitionValues"]["event_type"]
        per_part[et] = per_part.get(et, 0) + 1
    counts = spark.createDataFrame(
        [(et, n) for et, n in sorted(per_part.items())],
        "event_type string, files_in_partition bigint",
    )
    df = read_snapshot(spark, table_dir, partition_filter={"event_type": sel})
    return (
        df.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .join(F.broadcast(counts), "event_type")
        .withColumn("files_scanned", F.lit(files_scanned).cast("bigint"))
        .withColumn("files_total", F.lit(files_total).cast("bigint"))
        .orderBy("event_type")
    )


DELTA_PARTITION_PRUNE_SQL = """
SELECT e.event_type,
       count(*) AS n,
       count(DISTINCT e.user_id) AS n_users,
       round(sum(e.value), 2) AS total_value,
       CAST(2 AS BIGINT) AS files_in_partition,
       CAST(4 AS BIGINT) AS files_scanned,
       (SELECT 2 * count(DISTINCT event_type) FROM events) AS files_total
FROM events e
WHERE e.event_type IN ('click', 'purchase')
GROUP BY e.event_type
ORDER BY e.event_type
"""


DELTA_TIME_TRAVEL_SQL = """
WITH v(version, m0, m1, m2) AS (
    VALUES (CAST(0 AS BIGINT), true, false, false),
           (CAST(1 AS BIGINT), true, true,  false),
           (CAST(2 AS BIGINT), true, true,  true)
)
SELECT v.version,
       count(*) AS n,
       count(DISTINCT e.user_id) AS n_users,
       round(sum(e.value), 2) AS total_value,
       min(e.event_id) AS min_event_id,
       max(e.event_id) AS max_event_id
FROM v JOIN events e
  ON (e.event_id % 3 = 0 AND v.m0)
  OR (e.event_id % 3 = 1 AND v.m1)
  OR (e.event_id % 3 = 2 AND v.m2)
GROUP BY v.version
ORDER BY v.version
"""


# --- deletion vectors (round 9): row-level deletes without rewrites ----


def _build_dv_table_core(
    spark, sf_dir: str, stage_dir: str, tag: str, *, modulus: int, sidecar: bool
) -> None:
    """Two-version staging for the deletion-vector path:

    - v0: the full events projection written as parquet files;
    - v1: every file containing ``event_id % modulus == 0`` rows is
      remove+re-added WITH a deletionVector marking exactly those row
      positions — a row-level delete that rewrites NO data bytes (the
      whole point of DVs at 100 TB: deleting a few rows from a TB
      file costs a bitmap, not a rewrite). ``sidecar=True`` stores
      the bitmaps in ONE shared ``deletion_vector_{uuid}.bin`` file
      ("u" descriptors, the production layout); otherwise inline "i".

    The per-file deleted positions come from one scan of
    ``_metadata.(file_name, row_index)``; the collect is bounded by
    the deleted-row count and is staging-only (a production writer
    computes DVs distributed)."""
    from pyspark.sql import functions as F

    from . import delta_dv
    from .tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    adds_v0 = _write_version_files(spark, events, stage_dir, "v0")
    meta = {
        "metaData": {
            "id": f"rtba-dv-{tag}",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": events.schema.json(),
            "partitionColumns": [],
            "configuration": {},
            "createdTime": _T0,
        }
    }
    write_commit(stage_dir, 0, [PROTOCOL_ACTION, meta] + adds_v0)
    hits = (
        spark.read.parquet(os.path.join(stage_dir, "files_v0"))
        .select(
            F.col("_metadata.file_name").alias("fn"),
            F.col("_metadata.row_index").alias("ri"),
            "event_id",
        )
        .filter(F.col("event_id") % modulus == 0)
        .collect()  # bounded: the deleted-row positions (staging only)
    )
    per_file: dict[str, list[int]] = {}
    for r in hits:
        per_file.setdefault(r.fn, []).append(int(r.ri))
    hit_adds = [
        a
        for a in adds_v0
        if os.path.basename(a["add"]["path"]) in per_file
    ]
    if not hit_adds:
        raise ValueError("DV staging found no rows to delete")
    if sidecar:
        descs = delta_dv.dv_sidecar_write(
            stage_dir,
            [per_file[os.path.basename(a["add"]["path"])] for a in hit_adds],
            prefix="dv",
        )
    else:
        descs = [
            delta_dv.dv_inline_descriptor(
                per_file[os.path.basename(a["add"]["path"])]
            )
            for a in hit_adds
        ]
    actions = []
    for a, d in zip(hit_adds, descs):
        actions.append(
            {
                "remove": {
                    "path": a["add"]["path"],
                    "deletionTimestamp": _T0,
                    "dataChange": True,
                }
            }
        )
        new_add = dict(a["add"])
        new_add["deletionVector"] = d
        actions.append({"add": new_add})
    write_commit(stage_dir, 1, actions)


def _build_dv_table(spark, sf_dir: str, stage_dir: str, tag: str) -> None:
    _build_dv_table_core(
        spark, sf_dir, stage_dir, tag, modulus=7, sidecar=False
    )


def _build_dv_sidecar_table(spark, sf_dir: str, stage_dir: str, tag: str) -> None:
    _build_dv_table_core(
        spark, sf_dir, stage_dir, tag, modulus=5, sidecar=True
    )


def stage_events_as_delta_dv(spark, sf_dir: str) -> str:
    return _stage_table(spark, sf_dir, "deltadv", builder=_build_dv_table)


def stage_events_as_delta_dv_sidecar(spark, sf_dir: str) -> str:
    return _stage_table(
        spark, sf_dir, "deltadvu", builder=_build_dv_sidecar_table
    )


def delta_deletion_vectors(spark, sf_dir: str):
    """``s_delta_deletion_vectors`` — aggregate the DV-staged table at
    v0 (everything) and v1 (event_id % 7 == 0 rows deleted via inline
    deletion vectors, ZERO data files rewritten), plus the log-derived
    audit columns: number of DV'd files and the summed descriptor
    cardinality. One deleted row surviving the scan, one kept row
    dropped, or a descriptor whose cardinality disagrees with the
    bitmap breaks the hash against the oracle's %7 definition."""
    from pyspark.sql import functions as F

    table_dir = stage_events_as_delta_dv(spark, sf_dir)
    out = None
    for v in (0, 1):
        snap = replay(table_dir, v)
        dvs = [
            a["deletionVector"]
            for a in snap["_active"].values()
            if a.get("deletionVector")
        ]
        df = (
            read_snapshot(spark, table_dir, version=v)
            .agg(
                F.count("*").alias("n"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(F.sum("value"), 2).alias("total_value"),
                F.min("event_id").alias("min_event_id"),
                F.max("event_id").alias("max_event_id"),
            )
            .withColumn("version", F.lit(v).cast("bigint"))
            .withColumn(
                # the content-bound audit: summed descriptor cardinality
                # (file COUNTS depend on Spark's split and are not
                # content-deterministic, so they stay out of the hash)
                "deleted_rows",
                F.lit(sum(d["cardinality"] for d in dvs)).cast("bigint"),
            )
            .select(
                "version", "n", "n_users", "total_value",
                "min_event_id", "max_event_id", "deleted_rows",
            )
        )
        out = df if out is None else out.unionByName(df)
    return out


DELTA_DELETION_VECTORS_SQL = """
WITH v(version, keep_all) AS (
    VALUES (CAST(0 AS BIGINT), true), (CAST(1 AS BIGINT), false)
), del AS (
    SELECT count(*) AS deleted FROM events WHERE event_id % 7 = 0
)
SELECT v.version,
       count(*) AS n,
       count(DISTINCT e.user_id) AS n_users,
       round(sum(e.value), 2) AS total_value,
       min(e.event_id) AS min_event_id,
       max(e.event_id) AS max_event_id,
       CASE WHEN v.version = 1 THEN (SELECT deleted FROM del)
            ELSE CAST(0 AS BIGINT) END AS deleted_rows
FROM v JOIN events e ON v.keep_all OR e.event_id % 7 <> 0
GROUP BY v.version
ORDER BY v.version
"""


def delta_dv_sidecar(spark, sf_dir: str):
    """``s_delta_dv_sidecar`` — the sidecar-stored twin of
    ``s_delta_deletion_vectors`` (round 10, VERDICT r9 ask #2): the
    ``event_id % 5 == 0`` rows are deleted via "u" descriptors whose
    bitmaps live in ONE shared ``deletion_vector_{uuid}.bin`` file —
    the production layout (a delete commit lands O(1) DV files, not
    one per data file, and the data files are byte-identical). Audit
    columns: summed descriptor cardinality, the count of DISTINCT
    sidecar files (pinned 1 by construction), and the storage type.
    One deleted row surviving, one kept row dropped, a mis-framed
    offset, or a CRC/uuid resolution bug breaks the hash."""
    from pyspark.sql import functions as F

    from . import delta_dv

    table_dir = stage_events_as_delta_dv_sidecar(spark, sf_dir)
    out = None
    for v in (0, 1):
        snap = replay(table_dir, v)
        dvs = [
            a["deletionVector"]
            for a in snap["_active"].values()
            if a.get("deletionVector")
        ]
        files = {
            delta_dv.dv_sidecar_path(d, table_dir) for d in dvs
        }
        df = (
            read_snapshot(spark, table_dir, version=v)
            .agg(
                F.count("*").alias("n"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(F.sum("value"), 2).alias("total_value"),
                F.min("event_id").alias("min_event_id"),
                F.max("event_id").alias("max_event_id"),
            )
            .withColumn("version", F.lit(v).cast("bigint"))
            .withColumn(
                "deleted_rows",
                F.lit(sum(d["cardinality"] for d in dvs)).cast("bigint"),
            )
            .withColumn("dv_files", F.lit(len(files)).cast("bigint"))
            .withColumn(
                "storage_type",
                F.lit("".join(sorted({d["storageType"] for d in dvs}))),
            )
            .select(
                "version", "n", "n_users", "total_value",
                "min_event_id", "max_event_id", "deleted_rows",
                "dv_files", "storage_type",
            )
        )
        out = df if out is None else out.unionByName(df)
    return out


DELTA_DV_SIDECAR_SQL = """
WITH v(version, keep_all) AS (
    VALUES (CAST(0 AS BIGINT), true), (CAST(1 AS BIGINT), false)
), del AS (
    SELECT count(*) AS deleted FROM events WHERE event_id % 5 = 0
)
SELECT v.version,
       count(*) AS n,
       count(DISTINCT e.user_id) AS n_users,
       round(sum(e.value), 2) AS total_value,
       min(e.event_id) AS min_event_id,
       max(e.event_id) AS max_event_id,
       CASE WHEN v.version = 1 THEN (SELECT deleted FROM del)
            ELSE CAST(0 AS BIGINT) END AS deleted_rows,
       CASE WHEN v.version = 1 THEN CAST(1 AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS dv_files,
       CASE WHEN v.version = 1 THEN 'u' ELSE '' END AS storage_type
FROM v JOIN events e ON v.keep_all OR e.event_id % 5 <> 0
GROUP BY v.version
ORDER BY v.version
"""


# --- column mapping (round 9): rename without rewrite ------------------


def _cm_meta(
    tag: str,
    fields: list[tuple[str, str]],
    mode: str = "name",
    partition_cols: list[str] | None = None,
) -> dict:
    """metaData action for a column-mapped table (``mode`` "name" or
    "id"): logical field names map to fixed PHYSICAL names
    (col_1..col_n) and field ids (1..n) via the delta.columnMapping.*
    field metadata — the indirection that makes renames
    metadata-only. ``partition_cols`` are LOGICAL names (the
    schemaString is logical-first); the add actions' partitionValues
    key by the PHYSICAL names."""
    schema = {
        "type": "struct",
        "fields": [
            {
                "name": name,
                "type": typ,
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": i + 1,
                    "delta.columnMapping.physicalName": f"col_{i + 1}",
                },
            }
            for i, (name, typ) in enumerate(fields)
        ],
    }
    return {
        "metaData": {
            "id": f"rtba-cm-{tag}",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": list(partition_cols or []),
            "configuration": {"delta.columnMapping.mode": mode},
            "createdTime": _T0,
        }
    }


_CM_FIELDS = [
    ("event_id", "long"),
    ("user_id", "long"),
    ("event_type", "string"),
    ("value", "double"),
]


def _build_cm_table(spark, sf_dir: str, stage_dir: str, tag: str) -> None:
    """Column-mapped staging: v0 writes the events projection under
    PHYSICAL names col_1..col_4 with logical names in the metaData;
    v1 is a METADATA-ONLY commit renaming logical ``value`` →
    ``amount`` (same physicalName, zero data bytes touched)."""
    from pyspark.sql import functions as F

    from .tables import load_table

    physical = load_table(spark, sf_dir, "events").select(
        *[
            F.col(name).alias(f"col_{i + 1}")
            for i, (name, _t) in enumerate(_CM_FIELDS)
        ]
    )
    adds = _write_version_files(spark, physical, stage_dir, "v0")
    write_commit(stage_dir, 0, [PROTOCOL_ACTION, _cm_meta(tag, _CM_FIELDS)])
    # (two commits: metadata first, then the adds — exercises metaData
    # carry-forward through replay as well)
    write_commit(stage_dir, 1, adds)
    renamed = [
        ("amount", t) if n == "value" else (n, t) for n, t in _CM_FIELDS
    ]
    write_commit(stage_dir, 2, [_cm_meta(tag, renamed)])


def stage_events_as_delta_cm(spark, sf_dir: str) -> str:
    return _stage_table(spark, sf_dir, "deltacm", builder=_build_cm_table)


def delta_column_mapping(spark, sf_dir: str):
    """``s_delta_column_mapping`` — the column-mapped table read at
    v1 (logical column ``value``) and v2 (after the metadata-only
    rename: ``amount``, same physical bytes): per version the logical
    name served by the schema plus aggregates computed THROUGH the
    mapped column. A reader that resolves physical names wrong, loses
    the rename, or rewrites data to rename diverges (the oracle pins
    identical aggregates under both names and the pytest pins that
    the data files are untouched by the rename)."""
    from pyspark.sql import functions as F

    table_dir = stage_events_as_delta_cm(spark, sf_dir)
    out = None
    for v, col in ((1, "value"), (2, "amount")):
        df = read_snapshot(spark, table_dir, version=v)
        assert col in df.columns, (v, df.columns)
        agg = (
            df.agg(
                F.count("*").alias("n"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(F.sum(col), 2).alias("total_value"),
                F.min("event_id").alias("min_event_id"),
                F.max("event_id").alias("max_event_id"),
            )
            .withColumn("version", F.lit(v).cast("bigint"))
            .withColumn("value_col", F.lit(col))
            .select(
                "version", "value_col", "n", "n_users", "total_value",
                "min_event_id", "max_event_id",
            )
        )
        out = agg if out is None else out.unionByName(agg)
    return out


DELTA_COLUMN_MAPPING_SQL = """
WITH v(version, value_col) AS (
    VALUES (CAST(1 AS BIGINT), 'value'), (CAST(2 AS BIGINT), 'amount')
)
SELECT v.version, v.value_col,
       count(*) AS n,
       count(DISTINCT e.user_id) AS n_users,
       round(sum(e.value), 2) AS total_value,
       min(e.event_id) AS min_event_id,
       max(e.event_id) AS max_event_id
FROM v CROSS JOIN events e
GROUP BY v.version, v.value_col
ORDER BY v.version
"""


# --- column mapping, id mode + partitioned (round 10) -------------------


def _build_cm_id_table(spark, sf_dir: str, stage_dir: str, tag: str) -> None:
    """id-mode staging: the data files carry parquet FIELD IDS under
    column names (``anon_N``) that match NEITHER the logical names nor
    the metaData physicalName — a name-based reader has nothing to
    match on; only id resolution serves these files (the id-mode
    guarantee). v2 renames logical ``value`` -> ``revenue``
    metadata-only."""
    from pyspark.sql import functions as F

    from .tables import load_table

    physical = load_table(spark, sf_dir, "events").select(
        *[
            F.col(name).alias(
                f"anon_{i + 1}", metadata={"parquet.field.id": i + 1}
            )
            for i, (name, _t) in enumerate(_CM_FIELDS)
        ]
    )
    adds = _write_version_files(spark, physical, stage_dir, "v0")
    write_commit(
        stage_dir, 0, [PROTOCOL_ACTION, _cm_meta(tag, _CM_FIELDS, mode="id")]
    )
    write_commit(stage_dir, 1, adds)
    renamed = [
        ("revenue", t) if n == "value" else (n, t) for n, t in _CM_FIELDS
    ]
    write_commit(stage_dir, 2, [_cm_meta(tag, renamed, mode="id")])


def stage_events_as_delta_cm_id(spark, sf_dir: str) -> str:
    return _stage_table(spark, sf_dir, "deltacmid", builder=_build_cm_id_table)


def delta_cm_id_mode(spark, sf_dir: str):
    """``s_delta_cm_id_mode`` — the id-mode column-mapped table read
    at v1 (logical ``value``) and v2 (after the metadata-only rename:
    ``revenue``): the files' column names are deliberately foreign
    (``anon_N``), so every value in this result was resolved through
    parquet field ids (footer-driven per-file resolution — see
    ``read_snapshot``). A reader that
    falls back to name matching returns all-null columns and the
    aggregates diverge."""
    from pyspark.sql import functions as F

    table_dir = stage_events_as_delta_cm_id(spark, sf_dir)
    out = None
    for v, col in ((1, "value"), (2, "revenue")):
        df = read_snapshot(spark, table_dir, version=v)
        assert col in df.columns, (v, df.columns)
        agg = (
            df.agg(
                F.count("*").alias("n"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(F.sum(col), 2).alias("total_value"),
                F.min("event_id").alias("min_event_id"),
                F.max("event_id").alias("max_event_id"),
            )
            .withColumn("version", F.lit(v).cast("bigint"))
            .withColumn("value_col", F.lit(col))
            .select(
                "version", "value_col", "n", "n_users", "total_value",
                "min_event_id", "max_event_id",
            )
        )
        out = agg if out is None else out.unionByName(agg)
    return out


DELTA_CM_ID_MODE_SQL = """
WITH v(version, value_col) AS (
    VALUES (CAST(1 AS BIGINT), 'value'), (CAST(2 AS BIGINT), 'revenue')
)
SELECT v.version, v.value_col,
       count(*) AS n,
       count(DISTINCT e.user_id) AS n_users,
       round(sum(e.value), 2) AS total_value,
       min(e.event_id) AS min_event_id,
       max(e.event_id) AS max_event_id
FROM v CROSS JOIN events e
GROUP BY v.version, v.value_col
ORDER BY v.version
"""


def _build_cm_partitioned_table(
    spark, sf_dir: str, stage_dir: str, tag: str
) -> None:
    """Partitioned × column-mapping staging (the combination refused
    through round 9): events partitioned by ``event_type`` whose
    PHYSICAL name is ``col_3`` — the add actions' partitionValues key
    by that physical name per the spec. Data files store physical
    names col_1/col_2/col_4 (the partition column lives only in
    partitionValues). v1 renames BOTH the partition column
    (``event_type`` -> ``etype``) and ``value`` -> ``amount``,
    metadata-only."""
    from pyspark.sql import functions as F

    from .tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    etypes = [
        r[0]
        for r in events.select("event_type").distinct().orderBy("event_type").collect()
    ]  # bounded: one row per event type (5 at every SF)
    phys_data = {"event_id": "col_1", "user_id": "col_2", "value": "col_4"}
    adds = []
    for et in etypes:
        sub = f"files_cmpt/p={et}"
        out = os.path.join(stage_dir, sub)
        (
            events.filter(F.col("event_type") == et)
            .select(
                *[F.col(n).alias(p) for n, p in phys_data.items()]
            )
            .repartition(2)
            .write.mode("overwrite")
            .parquet(out)
        )
        for fn in sorted(os.listdir(out)):
            if fn.endswith(".parquet"):
                adds.append(
                    {
                        "add": {
                            "path": f"{sub}/{fn}",
                            # PHYSICAL partition key per the spec
                            "partitionValues": {"col_3": et},
                            "size": os.path.getsize(os.path.join(out, fn)),
                            "modificationTime": _T0,
                            "dataChange": True,
                        }
                    }
                )
    write_commit(
        stage_dir,
        0,
        [
            PROTOCOL_ACTION,
            _cm_meta(tag, _CM_FIELDS, partition_cols=["event_type"]),
        ]
        + adds,
    )
    renamed = [
        ("etype" if n == "event_type" else ("amount" if n == "value" else n), t)
        for n, t in _CM_FIELDS
    ]
    write_commit(
        stage_dir, 1, [_cm_meta(tag, renamed, partition_cols=["etype"])]
    )


def stage_events_as_delta_cm_partitioned(spark, sf_dir: str) -> str:
    return _stage_table(
        spark, sf_dir, "deltacmpt", builder=_build_cm_partitioned_table
    )


def delta_cm_partitioned(spark, sf_dir: str):
    """``s_delta_cm_partitioned`` — partitioned table under column
    mapping, read through LOGICAL partition filters at both versions:
    v0 filters ``event_type IN ('click','purchase')``, v1 (after the
    metadata-only rename) filters ``etype IN ('purchase','view')`` —
    different filters on the renamed column prove pruning re-resolves
    the logical->physical key each time. Pruning-audit columns ride
    along (2 files per partition by construction). A reader that
    keys partitionValues logically, loses the rename, or scans
    unselected partitions diverges."""
    from pyspark.sql import functions as F

    table_dir = stage_events_as_delta_cm_partitioned(spark, sf_dir)
    out = None
    for v, pcol, vcol, sel in (
        (0, "event_type", "value", {"click", "purchase"}),
        (1, "etype", "amount", {"purchase", "view"}),
    ):
        snap = replay(table_dir, v)
        pruned = prune_files(snap, {pcol: sel})
        files_scanned = len(pruned)
        files_total = len(snap["_active"])
        df = (
            read_snapshot(
                spark, table_dir, version=v, partition_filter={pcol: sel}
            )
            .groupBy(F.col(pcol).alias("part_value"))
            .agg(
                F.count("*").alias("n"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(F.sum(vcol), 2).alias("total_value"),
            )
            .withColumn("version", F.lit(v).cast("bigint"))
            .withColumn("files_scanned", F.lit(files_scanned).cast("bigint"))
            .withColumn("files_total", F.lit(files_total).cast("bigint"))
            .select(
                "version", "part_value", "n", "n_users", "total_value",
                "files_scanned", "files_total",
            )
        )
        out = df if out is None else out.unionByName(df)
    return out.orderBy("version", "part_value")


DELTA_CM_PARTITIONED_SQL = """
WITH v(version, part_value) AS (
    VALUES (CAST(0 AS BIGINT), 'click'), (CAST(0 AS BIGINT), 'purchase'),
           (CAST(1 AS BIGINT), 'purchase'), (CAST(1 AS BIGINT), 'view')
)
SELECT v.version,
       v.part_value,
       count(*) AS n,
       count(DISTINCT e.user_id) AS n_users,
       round(sum(e.value), 2) AS total_value,
       CAST(4 AS BIGINT) AS files_scanned,
       (SELECT 2 * count(DISTINCT event_type) FROM events) AS files_total
FROM v JOIN events e ON e.event_type = v.part_value
GROUP BY v.version, v.part_value
ORDER BY v.version, v.part_value
"""


# --- OPTIMIZE / compaction (round 10): dataChange=false commits --------


def _build_optimize_table(spark, sf_dir: str, stage_dir: str, tag: str) -> None:
    """Three-version staging for the OPTIMIZE lifecycle:

    - v0: the even-event_id rows written as 16 SMALL files (the
      small-file problem every streaming ingest creates);
    - v1: OPTIMIZE — remove all 16 adds and add 2 compacted files
      holding the SAME rows sorted by (user_id, event_id), every
      action carrying ``dataChange: false`` (the public protocol rule
      that lets readers and the change feed know no rows changed);
    - v2: a normal append (the odd rows, dataChange: true).

    The compaction rewrite is sorted so the compacted files double as
    a clustering pass — the real OPTIMIZE ... ZORDER shape (here a
    lexicographic sort; the Morton-curve variant is the
    dq_zorder_pruning_audit family's subject)."""
    from pyspark.sql import functions as F

    from .tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    evens = events.filter(F.col("event_id") % 2 == 0)
    odds = events.filter(F.col("event_id") % 2 == 1)

    small = evens.repartition(16)
    adds_v0 = []
    sub = "files_small"
    out = os.path.join(stage_dir, sub)
    small.write.mode("overwrite").parquet(out)
    for fn in sorted(os.listdir(out)):
        if fn.endswith(".parquet"):
            adds_v0.append(
                {
                    "add": {
                        "path": f"{sub}/{fn}",
                        "partitionValues": {},
                        "size": os.path.getsize(os.path.join(out, fn)),
                        "modificationTime": _T0,
                        "dataChange": True,
                    }
                }
            )
    meta = {
        "metaData": {
            "id": f"rtba-opt-{tag}",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": events.schema.json(),
            "partitionColumns": [],
            "configuration": {},
            "createdTime": _T0,
        }
    }
    write_commit(stage_dir, 0, [PROTOCOL_ACTION, meta] + adds_v0)

    # v1: OPTIMIZE — same rows, EXACTLY 2 per-file-clustered files
    # (repartition pins the count; a global sort + coalesce collapses
    # under AQE), dataChange FALSE on both sides (a true-flagged
    # compaction would replay every row into the change feed as
    # delete+insert — the bug this pins)
    compacted = evens.repartition(2).sortWithinPartitions(
        "user_id", "event_id"
    )
    sub2 = "files_opt"
    out2 = os.path.join(stage_dir, sub2)
    compacted.write.mode("overwrite").parquet(out2)
    actions = [
        {
            "remove": {
                "path": a["add"]["path"],
                "deletionTimestamp": _T0,
                "dataChange": False,
            }
        }
        for a in adds_v0
    ]
    for fn in sorted(os.listdir(out2)):
        if fn.endswith(".parquet"):
            actions.append(
                {
                    "add": {
                        "path": f"{sub2}/{fn}",
                        "partitionValues": {},
                        "size": os.path.getsize(os.path.join(out2, fn)),
                        "modificationTime": _T0,
                        "dataChange": False,
                    }
                }
            )
    write_commit(stage_dir, 1, actions)

    adds_v2 = _write_version_files(
        spark, odds.repartition(2), stage_dir, "v2"
    )
    write_commit(stage_dir, 2, adds_v2)


def stage_events_as_delta_optimized(spark, sf_dir: str) -> str:
    # kind "deltaopt2": repartition-pinned file counts must not reuse
    # a cached coalesce-built table
    return _stage_table(
        spark, sf_dir, "deltaopt2", builder=_build_optimize_table
    )


def delta_optimize_compaction(spark, sf_dir: str):
    """``s_delta_optimize_compaction`` — the OPTIMIZE lifecycle read
    back at every version, with the two protocol binds that make
    compaction correct at scale:

    - the v1 rewrite serves IDENTICAL data through 2 files instead of
      16 (``files_active`` audited from the log; at 100 TB compaction
      is what keeps scan task counts proportional to bytes, not to
      ingest batch counts);
    - ``dataChange: false`` keeps the optimize commit OUT of the
      change feed: ``cdf_rows`` per version is N_evens / 0 / N_odds —
      a compaction that replayed its rows into CDF would re-emit the
      whole table to every incremental consumer (the real protocol's
      reason for the flag)."""
    from pyspark.sql import functions as F

    table_dir = stage_events_as_delta_optimized(spark, sf_dir)
    out = None
    for v in (0, 1, 2):
        snap = replay(table_dir, v)
        try:
            cdf_rows = changes_between(spark, table_dir, v, v).count()
        except ValueError:
            cdf_rows = 0  # no dataChange actions in this commit
        df = (
            read_snapshot(spark, table_dir, version=v)
            .agg(
                F.count("*").alias("n"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(F.sum("value"), 2).alias("total_value"),
                F.min("event_id").alias("min_event_id"),
                F.max("event_id").alias("max_event_id"),
            )
            .withColumn("version", F.lit(v).cast("bigint"))
            .withColumn(
                "files_active", F.lit(len(snap["files"])).cast("bigint")
            )
            .withColumn("cdf_rows", F.lit(int(cdf_rows)).cast("bigint"))
            .select(
                "version", "n", "n_users", "total_value",
                "min_event_id", "max_event_id", "files_active", "cdf_rows",
            )
        )
        out = df if out is None else out.unionByName(df)
    return out


DELTA_OPTIMIZE_COMPACTION_SQL = """
WITH v(version, with_odds, files_active) AS (
    VALUES (CAST(0 AS BIGINT), false, CAST(16 AS BIGINT)),
           (CAST(1 AS BIGINT), false, CAST(2 AS BIGINT)),
           (CAST(2 AS BIGINT), true,  CAST(4 AS BIGINT))
), ev AS (
    SELECT CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_even,
           CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_odd
    FROM events
)
SELECT v.version,
       count(*) AS n,
       count(DISTINCT e.user_id) AS n_users,
       round(sum(e.value), 2) AS total_value,
       min(e.event_id) AS min_event_id,
       max(e.event_id) AS max_event_id,
       v.files_active,
       CASE WHEN v.version = 0 THEN (SELECT n_even FROM ev)
            WHEN v.version = 2 THEN (SELECT n_odd FROM ev)
            ELSE CAST(0 AS BIGINT) END AS cdf_rows
FROM v JOIN events e ON (e.event_id % 2 = 0) OR v.with_odds
GROUP BY v.version, v.files_active
ORDER BY v.version
"""


# -- round 11: CHECK constraints + generated columns --------------------


def _build_constraints_table(spark, sf_dir: str, stage_dir: str, tag: str) -> None:
    """v0 declares the writer features (minWriterVersion 4): two CHECK
    constraints in the table configuration and a generated column in
    the schema metadata. Then three appends through
    ``append_with_constraints``:

    - a DIRTY frame (value negated where ``event_id % 7 == 0``) —
      refused whole, log and file set untouched;
    - a frame PROVIDING the generated column with wrong values
      (``user_id % 10 + 1``) — refused the same way;
    - the clean remainder — committed as v1, the generated
      ``user_bucket`` materialized into the data files.

    The refused counts land in ``_constraints_audit.json`` so the
    registry query can bind them into its oracle-checked result."""
    from pyspark.sql import functions as F

    from .tables import load_table

    fields = [
        {"name": "event_id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "user_id", "type": "long", "nullable": True, "metadata": {}},
        {
            "name": "event_type",
            "type": "string",
            "nullable": True,
            "metadata": {},
        },
        {"name": "value", "type": "double", "nullable": True, "metadata": {}},
        {"name": "props", "type": "string", "nullable": True, "metadata": {}},
        {
            "name": "user_bucket",
            "type": "long",
            "nullable": True,
            "metadata": {"delta.generationExpression": "user_id % 10"},
        },
    ]
    meta = {
        "metaData": {
            "id": f"constraints_{tag}",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(
                {"type": "struct", "fields": fields}, separators=(",", ":")
            ),
            "partitionColumns": [],
            "configuration": {
                # NULL passes (props may be NULL): the SQL CHECK rule
                "delta.constraints.propsLenValid": "length(props) >= 0",
                "delta.constraints.valueNonNegative": "value >= 0",
            },
            "createdTime": _T0,
        }
    }
    write_commit(
        stage_dir,
        0,
        [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}}, meta],
    )
    base = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    audit: dict[str, dict[str, int]] = {}
    dirty = base.withColumn(
        "value",
        F.when(F.col("event_id") % 7 == 0, -F.col("value")).otherwise(
            F.col("value")
        ),
    )
    try:
        append_with_constraints(spark, stage_dir, dirty, f"{tag}_bad")
    except CheckConstraintViolation as e:
        audit["check_refused"] = e.violations
    else:
        raise AssertionError("violating append was not refused")
    if log_versions(stage_dir) != [0] or os.path.exists(
        os.path.join(stage_dir, f"files_{tag}_bad")
    ):
        raise AssertionError("refused append touched the table")
    clean = base.filter(F.col("event_id") % 7 != 0)
    try:
        append_with_constraints(
            spark,
            stage_dir,
            clean.withColumn("user_bucket", F.col("user_id") % 10 + 1),
            f"{tag}_wronggen",
        )
    except CheckConstraintViolation as e:
        audit["generated_refused"] = e.violations
    else:
        raise AssertionError("wrong generated values were not refused")
    if log_versions(stage_dir) != [0]:
        raise AssertionError("refused append touched the log")
    v = append_with_constraints(spark, stage_dir, clean, f"{tag}_v1")
    if v != 1:
        raise AssertionError(f"clean append landed at v{v}, expected 1")
    with open(os.path.join(stage_dir, "_constraints_audit.json"), "w") as f:
        json.dump(audit, f, sort_keys=True)


def stage_events_as_delta_constraints(spark, sf_dir: str) -> str:
    return _stage_table(
        spark, sf_dir, "delta_ck", builder=_build_constraints_table
    )


def delta_check_constraints(spark, sf_dir: str):
    """``s_delta_check_constraints`` — the constraint-guarded table
    read back: ``n``/``total_value`` prove the dirty append really
    never landed; ``bucket_sum``/``n_buckets`` aggregate the GENERATED
    column out of the data files (materialized by the writer, not the
    scan); the two ``*_refused`` audit columns carry the violating-row
    counts from the refused commits, which the oracle recomputes from
    the parquet truth."""
    from pyspark.sql import functions as F

    table_dir = stage_events_as_delta_constraints(spark, sf_dir)
    with open(os.path.join(table_dir, "_constraints_audit.json")) as f:
        audit = json.load(f)
    n_check = audit["check_refused"]["CHECK valueNonNegative"]
    n_gen = audit["generated_refused"]["generated column user_bucket"]
    return (
        read_snapshot(spark, table_dir)
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.sum("user_bucket").alias("bucket_sum"),
            F.countDistinct("user_bucket").alias("n_buckets"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
        .withColumn("n_check_refused", F.lit(n_check).cast("bigint"))
        .withColumn("n_gen_refused", F.lit(n_gen).cast("bigint"))
    )


DELTA_CHECK_CONSTRAINTS_SQL = """
SELECT count(*) AS n,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 2) AS total_value,
       CAST(sum(user_id % 10) AS BIGINT) AS bucket_sum,
       count(DISTINCT user_id % 10) AS n_buckets,
       min(event_id) AS min_event_id,
       max(event_id) AS max_event_id,
       (SELECT count(*) FROM events WHERE event_id % 7 = 0)
           AS n_check_refused,
       (SELECT count(*) FROM events WHERE event_id % 7 <> 0)
           AS n_gen_refused
FROM events WHERE event_id % 7 <> 0
"""


# -- round 11: RESTORE (version rollback as a forward commit) -----------


def restore_to_version(table_dir: str, version: int) -> int:
    """Delta RESTORE semantics: roll the table BACK to ``version`` by
    rolling the log FORWARD — one new commit whose adds/removes make
    the active file set equal the target snapshot's. Nothing is
    deleted (history including the undone versions stays time-
    travelable; the restored-over files remain dead until vacuum),
    which is what distinguishes RESTORE from log truncation and why
    it is safe under concurrent readers. The commit carries a
    ``commitInfo`` with operation RESTORE + the target version, the
    shape delta-spark writes. Returns the committed version."""
    target = replay(table_dir, version)
    head = replay(table_dir)
    want = target["_active"]
    have = head["_active"]
    actions: list[dict] = [
        {
            "commitInfo": {
                "operation": "RESTORE",
                "operationParameters": {"version": str(version)},
                "timestamp": _T0,
            }
        }
    ]
    for path in sorted(set(have) - set(want)):
        actions.append(
            {
                "remove": {
                    "path": path,
                    "deletionTimestamp": _T0,
                    "dataChange": True,
                }
            }
        )
    for path in sorted(set(want) - set(have)):
        actions.append({"add": dict(want[path], dataChange=True)})
    return commit_with_retry(table_dir, actions)


def stage_events_as_delta_restored(spark, sf_dir: str) -> str:
    """The shared three-version table + a v3 RESTORE back to v1."""

    def build(spark_, sf_dir_, stage_dir, tag):
        _build_three_version_table(spark_, sf_dir_, stage_dir, tag)
        v = restore_to_version(stage_dir, 1)
        if v != 3:
            raise AssertionError(f"restore landed at v{v}, expected 3")

    return _stage_table(spark, sf_dir, "delta_restore", builder=build)


def delta_restore(spark, sf_dir: str):
    """``s_delta_restore`` — the RESTORE lifecycle read at every
    version: v1 (pre-compaction: evens + odds-mod-1), v2 (the
    compaction overwrite), v3 (RESTORE to v1 — same ROWS as v1
    through v1's original files, audited by ``files_active``), with
    the undone v2 still time-travelable. A restore that forgot a
    remove double-counts the compacted rows; one that dropped an add
    loses them — either breaks the hash."""
    from pyspark.sql import functions as F

    table_dir = stage_events_as_delta_restored(spark, sf_dir)
    v1_files = set(replay(table_dir, 1)["files"])
    out = None
    for v in (1, 2, 3):
        snap = replay(table_dir, v)
        df = (
            read_snapshot(spark, table_dir, version=v)
            .agg(
                F.count("*").alias("n"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(F.sum("value"), 2).alias("total_value"),
                F.min("event_id").alias("min_event_id"),
                F.max("event_id").alias("max_event_id"),
            )
            .withColumn("version", F.lit(v).cast("bigint"))
            .withColumn(
                # the structural bind: v3 serves v1's ROWS through
                # v1's ORIGINAL files (true), while v2's compaction
                # files differ (false) — SF-independent, unlike raw
                # file counts
                "same_files_as_v1",
                F.lit(set(snap["files"]) == v1_files),
            )
            .select(
                "version", "n", "n_users", "total_value",
                "min_event_id", "max_event_id", "same_files_as_v1",
            )
        )
        out = df if out is None else out.unionByName(df)
    return out


DELTA_RESTORE_SQL = """
WITH v(version, with_twos, same_files_as_v1) AS (
    VALUES (CAST(1 AS BIGINT), false, true),
           (CAST(2 AS BIGINT), true,  false),
           (CAST(3 AS BIGINT), false, true)
)
SELECT v.version,
       count(*) AS n,
       count(DISTINCT e.user_id) AS n_users,
       round(sum(e.value), 2) AS total_value,
       min(e.event_id) AS min_event_id,
       max(e.event_id) AS max_event_id,
       v.same_files_as_v1
FROM v JOIN events e
  ON (e.event_id % 3 IN (0, 1)) OR v.with_twos
GROUP BY v.version, v.same_files_as_v1
ORDER BY v.version
"""


# -- round 11: ADD-COLUMN schema evolution ------------------------------


def _build_schema_evolution_table(
    spark, sf_dir: str, stage_dir: str, tag: str
) -> None:
    """v0: (event_id, user_id, value) rows with even event_id under
    schema A; v1: a metaData commit WIDENING the schema with
    ``category`` string + odd-event_id files that carry it. The v0
    data files are never touched — the latest snapshot must serve
    them with ``category`` NULL (reading with the CURRENT metadata
    schema, not file inference)."""
    from pyspark.sql import functions as F

    from .tables import load_table

    def meta_action(fields):
        return {
            "metaData": {
                "id": f"evo_{tag}",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(
                    {
                        "type": "struct",
                        "fields": [
                            {
                                "name": n,
                                "type": t,
                                "nullable": True,
                                "metadata": {},
                            }
                            for n, t in fields
                        ],
                    }
                ),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": _T0,
            }
        }

    ev = load_table(spark, sf_dir, "events")
    v0_rows = ev.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "user_id", "value"
    )
    adds0 = _write_version_files(spark, v0_rows, stage_dir, "v0")
    write_commit(
        stage_dir,
        0,
        [
            PROTOCOL_ACTION,
            meta_action(
                [("event_id", "long"), ("user_id", "long"), ("value", "double")]
            ),
        ]
        + adds0,
    )
    v1_rows = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id",
        "user_id",
        "value",
        F.concat(F.lit("c"), (F.col("user_id") % 5).cast("string")).alias(
            "category"
        ),
    )
    adds1 = _write_version_files(spark, v1_rows, stage_dir, "v1")
    write_commit(
        stage_dir,
        1,
        [
            meta_action(
                [
                    ("event_id", "long"),
                    ("user_id", "long"),
                    ("value", "double"),
                    ("category", "string"),
                ]
            )
        ]
        + adds1,
    )


def stage_events_as_delta_evolved(spark, sf_dir: str) -> str:
    return _stage_table(
        spark, sf_dir, "delta_evo", builder=_build_schema_evolution_table
    )


def delta_schema_evolution(spark, sf_dir: str):
    """``s_delta_schema_evolution`` — ADD COLUMN as a metadata-only
    widening: v0 reads under the 3-column schema; the latest snapshot
    reads BOTH generations under the 4-column schema, old files
    serving NULL ``category`` (``n_no_category`` = the even half) and
    new files their written values — per-category aggregates bind the
    NULL routing exactly."""
    from pyspark.sql import functions as F

    table_dir = stage_events_as_delta_evolved(spark, sf_dir)
    v0 = read_snapshot(spark, table_dir, version=0)
    head = read_snapshot(spark, table_dir)
    v0_agg = v0.agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).withColumn("category", F.lit("(v0)"))
    head_agg = head.groupBy(
        F.coalesce(F.col("category"), F.lit("(none)")).alias("category")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return v0_agg.select("category", "n", "total_value").unionByName(
        head_agg
    )


DELTA_SCHEMA_EVOLUTION_SQL = """
SELECT '(v0)' AS category, count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events WHERE event_id % 2 = 0
UNION ALL
SELECT '(none)' AS category, count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events WHERE event_id % 2 = 0
UNION ALL
SELECT concat('c', CAST(user_id % 5 AS VARCHAR)) AS category,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events WHERE event_id % 2 = 1
GROUP BY user_id % 5
"""
