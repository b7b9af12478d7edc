"""Table integrity checker (lake fsck).

Validates a LakeTable's metadata and (optionally) data invariants —
the ops tool you reach for after a crash, a botched manual cleanup, or
suspected snapshot-retention damage. The reference had nothing like
it; ClickHouse's `CHECK TABLE` is the closest analogue.

Metadata checks (cheap — manifest + filesystem stat only):

- VERSION resolves to a readable manifest; the parent chain walks back
  to a root (``parent_id`` None) without missing manifests;
- every data file referenced by the current manifest exists on disk;
- ``file_stats`` only describes referenced files;
- ``delta_buckets`` only flags buckets that actually have files;
- the schema parses and contains every key column.

Deep checks (``deep=True`` — one Spark job over the data):

- after MoR resolution each key has exactly one live row (the
  latest-version-wins invariant readers depend on);
- files are readable with the manifest schema.

Returns a report dict; ``ok`` is False if any check failed. The CLI
(``python -m spark_cdc check --table ...``) exits non-zero on damage.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import functions as F

from spark_cdc.lake.table import META_DIR, VERSION_FILE, LakeTable


def fsck(
    table: LakeTable,
    deep: bool = False,
    repair: bool = False,
    repair_min_age_sec: float = 300.0,
) -> dict[str, Any]:
    """``repair_min_age_sec``: a manifest ahead of VERSION is only
    deleted when its mtime is at least this old. A LEGITIMATE in-flight
    commit sits in exactly the ahead-of-VERSION state between writing
    snap-N.json and advancing VERSION; an age guard keeps repair from
    racing it (deleting the manifest a live writer is about to point
    VERSION at would corrupt the table head). Pass 0 only when you can
    assert no writers are active."""
    errors: list[str] = []
    warnings: list[str] = []

    # VERSION → manifest → parent chain
    try:
        with open(os.path.join(table.path, META_DIR, VERSION_FILE)) as f:
            head = int(f.read().strip())
    except (OSError, ValueError) as e:
        return {"ok": False, "errors": [f"VERSION unreadable: {e}"], "warnings": []}

    # manifests AHEAD of VERSION: a commit that crashed between writing
    # its snapshot file and advancing VERSION (or a concurrent loser's
    # leftover). Harmless to readers but blocks the next writer's
    # O_EXCL claim on that id — report; remove with repair=True.
    import re

    ahead = sorted(
        sid for fn in os.listdir(os.path.join(table.path, META_DIR))
        for m in [re.fullmatch(r"snap-(\d+)\.json", fn)]
        if m and (sid := int(m.group(1))) > head
    )
    repaired = []
    if ahead:
        if repair:
            import time as _time

            now = _time.time()
            for sid in ahead:
                p = os.path.join(table.path, META_DIR, f"snap-{sid}.json")
                try:
                    age = now - os.path.getmtime(p)
                except OSError:
                    continue  # already gone — racing writer finished or cleaned up
                if age < repair_min_age_sec:
                    warnings.append(
                        f"manifest snap-{sid} is ahead of VERSION but only "
                        f"{age:.0f}s old (< {repair_min_age_sec:.0f}s) — may be an "
                        "in-flight commit; not repaired. Re-run later or lower "
                        "repair_min_age_sec if no writers are active."
                    )
                    continue
                os.remove(p)
                repaired.append(sid)
        else:
            warnings.append(
                f"{len(ahead)} uncommitted manifest(s) ahead of VERSION "
                f"(crashed or conflicted commit): {ahead} — blocks the next "
                "writer; run repair to clear"
            )
    # Corrupt manifests raise ValueError subclasses (json.JSONDecodeError,
    # truncated int fields), not just OSError — catch both, and never
    # re-read the head outside this guard: if the head manifest itself is
    # damaged, fsck must REPORT that, not crash with the same traceback
    # the user ran fsck to diagnose.
    chain = 0
    manifest: dict | None = None
    sid: int | None = head
    while sid is not None:
        try:
            m = table._read_manifest(sid)
        except (OSError, ValueError) as e:
            errors.append(f"manifest snap-{sid} unreadable: {e}")
            break
        if sid == head:
            manifest = m
        chain += 1
        sid = m["parent_id"]

    if manifest is None:
        return {
            "ok": False,
            "snapshot_id": head,
            "chain_length": 0,
            "errors": errors or [f"head manifest snap-{head} unreadable"],
            "warnings": warnings,
        }

    # schema + keys
    try:
        from pyspark.sql import types as T

        schema = T.StructType.fromJson(manifest["schema"])
        missing_keys = [k for k in manifest["key_columns"] if k not in schema.names]
        if missing_keys:
            errors.append(f"key columns missing from schema: {missing_keys}")
    except Exception as e:
        errors.append(f"schema unparseable: {e}")

    # files on disk
    referenced: set[str] = set()
    missing_files = []
    for b, flist in manifest["files"].items():
        for rel in flist:
            referenced.add(rel)
            if not os.path.exists(os.path.join(table.path, rel)):
                missing_files.append(rel)
    if missing_files:
        errors.append(f"{len(missing_files)} referenced data files missing "
                      f"(first: {missing_files[0]})")

    # stats and delta flags describe only live state
    dangling_stats = [f for f in manifest.get("file_stats", {}) if f not in referenced]
    if dangling_stats:
        warnings.append(f"{len(dangling_stats)} file_stats entries for unreferenced files")
    empty_delta = [b for b in manifest.get("delta_buckets", [])
                   if str(b) not in manifest["files"]]
    if empty_delta:
        warnings.append(f"delta_buckets flags buckets without files: {empty_delta}")

    report: dict[str, Any] = {
        "snapshot_id": head,
        "chain_length": chain,
        "files": len(referenced),
        "buckets": len(manifest["files"]),
    }

    if deep and not missing_files and manifest["key_columns"]:
        keys = list(manifest["key_columns"])
        dupes = (
            table.read(snapshot_id=head)
            .groupBy(*keys)
            .count()
            .where(F.col("count") > 1)
            .count()
        )
        if dupes:
            errors.append(
                f"{dupes} keys resolve to more than one live row "
                "(latest-version-wins invariant violated)"
            )
        report["deep_checked"] = True

    report["ok"] = not errors
    report["errors"] = errors
    report["warnings"] = warnings
    if repaired:
        report["repaired_manifests"] = repaired
    return report
