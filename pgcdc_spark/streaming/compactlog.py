"""Crash-atomic delta-log compaction protocol.

Shared by streaming/ivm.py (delta-log folds) and streaming/dedup.py (LSM
state folds). The fold is the state's ONLY source of truth, so "delete
the log, then write the replacement" is a loss window. Protocol
(local-FS / HDFS rename atomicity via pgcdc_spark/fs.py):

1. the writer creates a fresh EPOCH-SCOPED scratch dir
   ``<root>/_compact-<uuid>`` and writes the folded result under
   ``<scratch>/base`` — the leading underscore hides it from Spark's
   parquet reader;
2. it fsyncs a ``<scratch>/COMMIT`` manifest RECORDING THE EXACT VICTIM
   partitions the fold covers AND the UNIQUE partition name the fold
   will be published under: from here the fold is authoritative for
   precisely those victims;
3. any finisher (the writer, or a reader running recovery after a
   crash) deletes the recorded victims, renames ``<scratch>/base`` to
   the recorded publish name, and drops the scratch dir.

A crash before 2 leaves the log untouched (the single-writer maintenance
path discards its own COMMIT-less scratches on its next run; readers
never touch them — deleting one would abort live maintenance). A crash
after 2 is finished by the next ``recover_compaction`` (reader or
writer); every step is idempotent, so any number of concurrent
finishers may replay it.

Two properties make concurrent/stale finishers harmless WITHOUT any
locking, claiming, or liveness detection (round-6 review: the previous
protocol's "race-tolerant" finish let a recoverer that stalled after
reading COMMIT wake up later and delete the state another process had
just published):

- **The publish name is unique per compaction and never appears in any
  victims list.** The old protocol reused one name (``delta_batch=base``
  / ``batch=0``), which made the PREVIOUS fold a victim of the next
  compaction — so a stale victim sweep could hit freshly published
  state. Now a victims list only ever names already-superseded
  partitions: replaying it at ANY later time deletes nothing live.
  (Victim names are never recreated: delta labels are monotone and the
  stores' applied-label gates make replays of folded batches no-ops.)
- **The scratch dir is unique per compaction.** A stale finisher's
  every remaining step references its own cycle's scratch, which never
  exists again once finished — its reads and renames ENOENT out, and
  its scratch delete can never hit a LATER cycle's in-flight fold (the
  fixed ``_compact`` name made that collision possible).

Within one cycle, co-finishers are safe by idempotence: victim deletes
are no-ops the second time, and the publish rename has a single source
dir, so exactly one finisher moves it; the losers see ENOENT and stand
down. Legacy scratches from the previous layout (a fixed ``_compact``
dir whose COMMIT is a bare victims array) are still recovered, published
under the caller's legacy name.
"""

from __future__ import annotations

import json
import os
import uuid

from ..fs import get_fs

_SCRATCH = "_compact"


def new_scratch(root: str) -> str:
    """A fresh epoch-scoped scratch dir path for one compaction cycle."""
    return os.path.join(root, f"{_SCRATCH}-{uuid.uuid4().hex[:8]}")


def _finish_one(fs, root: str, scratch: str, legacy_publish: str) -> None:
    """Replay the idempotent finish of one COMMIT-ted scratch."""
    try:
        raw = fs.read_text(os.path.join(scratch, "COMMIT"))
    except FileNotFoundError:
        return  # a co-finisher already consumed this scratch
    c = json.loads(raw)
    if isinstance(c, list):  # legacy layout: bare victims array
        victims, publish = c, legacy_publish
    else:
        victims, publish = c["victims"], c["publish"]
    base = os.path.join(scratch, "base")
    if fs.is_dir(base):
        for d in victims:
            fs.delete(os.path.join(root, d))
        try:
            fs.rename(base, os.path.join(root, publish))
        except FileNotFoundError:
            pass  # a co-finisher won the publish rename
    fs.delete(scratch)


def recover_compaction(root: str, legacy_publish: str, writer: bool = False) -> None:
    """Finish any COMMIT-ted compaction a crash interrupted, or (writer
    path only) discard COMMIT-less scratch dirs.

    Readers must run this too: a crash after COMMIT but mid-victim-delete
    leaves the log in a state where folding the surviving deltas would
    silently return PARTIAL results — the committed fold is authoritative
    from COMMIT onward, so it must be published before the log is read.
    The finish is idempotent and needs no coordination (see module doc),
    so a reader simply does the work instead of waiting on an owner."""
    fs = get_fs(root)
    if not fs.is_dir(root):
        return
    for name in sorted(fs.listdir(root)):
        if name != _SCRATCH and not name.startswith(_SCRATCH + "-"):
            continue
        scratch = os.path.join(root, name)
        if not fs.is_dir(scratch):
            continue
        if not fs.is_file(os.path.join(scratch, "COMMIT")):
            # fold never committed: only the single-writer maintenance
            # path may discard it — for a reader it may be an in-flight
            # compactor's live scratch
            if writer:
                fs.delete(scratch)
            continue
        _finish_one(fs, root, scratch, legacy_publish)


def commit_and_publish(
    root: str, scratch: str, victims: list[str], publish: str
) -> str:
    """Writer-side steps 2-3: fsync the COMMIT manifest over an already
    written ``<scratch>/base`` fold — recording the victims and the
    caller's UNIQUE publish name (ivm: ``delta_batch=base-<uuid>``;
    dedup, whose replay filter parses batch ids as BIGINT:
    ``batch=<min(existing ids)-1>``) — then run the finish. Returns the
    published partition name. The caller must never reuse a publish
    name: uniqueness is what makes stale victim sweeps harmless."""
    fs = get_fs(root)
    fs.write_text_atomic(
        os.path.join(scratch, "COMMIT"),
        json.dumps({"victims": victims, "publish": publish}),
    )
    _finish_one(fs, root, scratch, publish)
    return publish
