"""Crash-atomic compaction protocol: unique publish names + epoch scratch.

Pure-filesystem tests (no Spark): the protocol moves directories and
one-line manifests; the fold contents are opaque to it. The headline
test deterministically replays the round-6 TOCTOU: a recoverer that has
already seen COMMIT stalls, a concurrent process completes the entire
recovery, and the stalled recoverer wakes up and replays every remaining
step — under the old protocol (fixed publish name, present in the next
victims list) its unconditional victim sweep deleted the just-published
state; now no victims list ever names live state, so the replay is a
string of idempotent no-ops.
"""

from __future__ import annotations

import json
import os

from pgcdc_spark.fs import get_fs
from pgcdc_spark.streaming import compactlog

LEGACY = "delta_batch=base"


def _mk_committed(root: str, victims: list[str], publish: str) -> str:
    """A crash-after-COMMIT state: victims on disk, fold in
    <scratch>/base, COMMIT recording victims + unique publish name."""
    for v in victims:
        os.makedirs(os.path.join(root, v), exist_ok=True)
        with open(os.path.join(root, v, "part-0.parquet"), "w") as f:
            f.write(f"old:{v}")
    scratch = compactlog.new_scratch(root)
    base = os.path.join(scratch, "base")
    os.makedirs(base, exist_ok=True)
    with open(os.path.join(base, "part-0.parquet"), "w") as f:
        f.write("folded")
    with open(os.path.join(scratch, "COMMIT"), "w") as f:
        f.write(json.dumps({"victims": victims, "publish": publish}))
    return scratch


def _content(root: str, name: str) -> str:
    with open(os.path.join(root, name, "part-0.parquet")) as f:
        return f.read()


def test_recover_finishes_committed_fold(tmp_path):
    root = str(tmp_path / "log")
    victims = ["delta_batch=base-aa11", "delta_batch=3", "delta_batch=4"]
    _mk_committed(root, victims, "delta_batch=base-bb22")
    compactlog.recover_compaction(root, LEGACY)
    assert _content(root, "delta_batch=base-bb22") == "folded"
    assert sorted(os.listdir(root)) == ["delta_batch=base-bb22"]


def test_recover_finishes_legacy_fixed_name_layout(tmp_path):
    """COMMITs written by the previous layout (fixed _compact dir, bare
    victims array) still recover, published under the legacy name."""
    root = str(tmp_path / "log")
    victims = [LEGACY, "delta_batch=7"]
    for v in victims:
        os.makedirs(os.path.join(root, v))
        with open(os.path.join(root, v, "part-0.parquet"), "w") as f:
            f.write(f"old:{v}")
    base = os.path.join(root, "_compact", "base")
    os.makedirs(base)
    with open(os.path.join(base, "part-0.parquet"), "w") as f:
        f.write("folded")
    with open(os.path.join(root, "_compact", "COMMIT"), "w") as f:
        f.write(json.dumps(victims))
    compactlog.recover_compaction(root, LEGACY)
    assert _content(root, LEGACY) == "folded"
    assert sorted(os.listdir(root)) == [LEGACY]


def test_reader_never_touches_commitless_scratch(tmp_path):
    root = str(tmp_path / "log")
    scratch = compactlog.new_scratch(root)
    os.makedirs(os.path.join(scratch, "base"))
    os.makedirs(os.path.join(root, "delta_batch=1"))
    compactlog.recover_compaction(root, LEGACY)  # reader: hands off
    assert os.path.isdir(os.path.join(scratch, "base"))
    compactlog.recover_compaction(root, LEGACY, writer=True)
    assert not os.path.exists(scratch)
    assert os.path.isdir(os.path.join(root, "delta_batch=1"))  # untouched


def test_stale_recoverer_cannot_delete_published_state(tmp_path, monkeypatch):
    """The round-6 TOCTOU, deterministically: recoverer A confirms COMMIT,
    stalls; B completes the whole recovery; A resumes and replays every
    remaining step (victim sweep, publish rename, scratch delete). The
    published fold must survive — A's victims never name it (unique
    publish names), and A's scratch paths no longer exist."""
    root = str(tmp_path / "log")
    victims = ["delta_batch=base-prev", "delta_batch=9"]
    publish = "delta_batch=base-new1"
    scratch = _mk_committed(root, victims, publish)
    real = get_fs(root)
    commit_path = os.path.join(scratch, "COMMIT")

    class StallThenLoseFS:
        """Delegates to the real FS, but the first time recoverer A
        confirms COMMIT exists, runs B's ENTIRE recovery before A can
        act — the exact interleaving of the review finding."""

        def __init__(self):
            self.fired = False

        def __getattr__(self, name):
            return getattr(real, name)

        def is_file(self, path):
            ok = real.is_file(path)
            if ok and path == commit_path and not self.fired:
                self.fired = True
                compactlog._finish_one(real, root, scratch, LEGACY)
            return ok

    monkeypatch.setattr(compactlog, "get_fs", lambda _root: StallThenLoseFS())
    compactlog.recover_compaction(root, LEGACY)  # A's run, B fires mid-way
    assert _content(root, publish) == "folded"
    assert sorted(os.listdir(root)) == [publish]

    # and a FULLY stale A — wakes long after everything finished, replays
    # its in-memory plan verbatim against the real FS — is also harmless
    for d in victims:
        real.delete(os.path.join(root, d))          # A's victim sweep
    try:
        real.rename(os.path.join(scratch, "base"),  # A's publish rename
                    os.path.join(root, publish))
    except FileNotFoundError:
        pass
    real.delete(scratch)                            # A's scratch drop
    assert _content(root, publish) == "folded"
    assert sorted(os.listdir(root)) == [publish]


def test_next_cycle_folds_published_base_safely(tmp_path):
    """Cycle N+1 lists cycle N's published base as a victim — legal,
    because N+1 publishes under a FRESH name; a stale N+1 finisher replay
    after N+2 commits cannot hit N+2's publish either."""
    root = str(tmp_path / "log")
    _mk_committed(root, ["delta_batch=1"], "delta_batch=base-n1")
    compactlog.recover_compaction(root, LEGACY)
    # cycle 2: fold base-n1 + new delta into base-n2
    os.makedirs(os.path.join(root, "delta_batch=2"))
    with open(os.path.join(root, "delta_batch=2", "part-0.parquet"), "w") as f:
        f.write("old:2")
    scratch2 = compactlog.new_scratch(root)
    os.makedirs(os.path.join(scratch2, "base"))
    with open(os.path.join(scratch2, "base", "part-0.parquet"), "w") as f:
        f.write("folded2")
    compactlog.commit_and_publish(
        root, scratch2, ["delta_batch=base-n1", "delta_batch=2"],
        "delta_batch=base-",
    )
    (pub2,) = [d for d in os.listdir(root) if d.startswith("delta_batch=base-")]
    assert _content(root, pub2) == "folded2"
    assert sorted(os.listdir(root)) == [pub2]


def test_concurrent_recoverers_thread_race(tmp_path):
    """N threads race the same committed fold; every step is idempotent,
    so the final state is the published fold with no victims and no
    scratch, and no thread errors."""
    import threading

    root = str(tmp_path / "log")
    victims = ["delta_batch=base-old"] + [f"delta_batch={i}" for i in range(3, 9)]
    publish = "delta_batch=base-race"
    _mk_committed(root, victims, publish)
    errs = []

    def run():
        try:
            compactlog.recover_compaction(root, LEGACY)
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    threads = [threading.Thread(target=run) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert _content(root, publish) == "folded"
    assert sorted(os.listdir(root)) == [publish]
