"""Pins bench.py's /dev/shm scratch-sweep ownership semantics.

Liveness of a sibling run's scratch dir is decided by an exclusive
flock on ``run-<pid>/.owner`` held for the owner's process lifetime —
NOT by ``/proc/<pid>`` existence, which lies in both directions (PID
reuse by an unrelated process pins hundreds of MB of tmpfs forever;
a shared /dev/shm across PID namespaces would sweep a LIVE sibling
mid-measurement). Lockless dirs (crash before lock creation, pre-lock
layout) fall back to the /proc probe.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _hold_owner_lock, _scratch_is_dead  # noqa: E402


def test_free_lock_means_dead(tmp_path):
    """.owner exists but nobody holds it -> owner crashed -> sweepable,
    even when /proc/<pid> exists (PID-reuse case: probe pid 1). The
    dir is aged past the TOCTOU grace window first — a fresh dir with
    a free lock is NOT yet trustworthy (see test below)."""
    d = tmp_path / "run-1"
    d.mkdir()
    (d / ".owner").touch()
    os.utime(d, (1.0, 1.0))  # well past _OWNER_GRACE_SEC
    assert _scratch_is_dead(str(d), 1)


def test_young_dir_free_lock_needs_dead_proc(tmp_path):
    """TOCTOU guard: between a sibling's os.open creating .owner and
    its flock call, the lock reads as free. A dir younger than the
    grace window with a LIVE /proc pid must be spared; the same young
    dir with a dead pid (crash before flock) is sweepable."""
    d = tmp_path / "run-1"
    d.mkdir()
    (d / ".owner").touch()  # fresh mtime: inside the grace window
    assert not _scratch_is_dead(str(d), 1)  # pid 1 alive -> spared
    assert _scratch_is_dead(str(d), 4999999)  # dead pid -> sweepable


def test_held_lock_means_live(tmp_path):
    """A held flock spares the dir even when the recorded PID looks
    dead from this namespace (shared-/dev/shm case)."""
    d = tmp_path / "run-4999999"
    d.mkdir()
    fd = _hold_owner_lock(str(d))
    assert fd is not None
    try:
        assert not _scratch_is_dead(str(d), 4999999)
    finally:
        os.close(fd)
    # releasing the fd releases the lock -> now sweepable
    assert _scratch_is_dead(str(d), 4999999)


def test_lockless_dir_falls_back_to_proc(tmp_path):
    d = tmp_path / "run-x"
    d.mkdir()
    assert not _scratch_is_dead(str(d), 1)  # pid 1 always alive
    assert _scratch_is_dead(str(d), 4999999)  # beyond pid_max


def test_stray_file_under_root_is_reclaimed(tmp_path):
    """The reclamation branch must os.remove plain files — rmtree
    (even without ignore_errors) raises on a file, so a file-only
    branch is load-bearing. Mirrors the sweep's non-run-* arm."""
    root = tmp_path / "root"
    root.mkdir()
    stray_file = root / "tmp1234.parquet"
    stray_file.write_text("x")
    stray_dir = root / "mkdtemp-legacy"
    stray_dir.mkdir()
    # replicate the sweep's reclamation arm
    for entry in os.listdir(root):
        path = os.path.join(root, entry)
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        else:
            try:
                os.remove(path)
            except OSError:
                pass
    assert os.listdir(root) == []
