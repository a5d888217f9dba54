"""Latency-injecting pyarrow filesystem for scale experiments.

``make_latency_filesystem(root, latency_s)`` behaves like
``SubTreeFileSystem(root, LocalFileSystem())`` except every INPUT open
first sleeps ``latency_s`` — a deterministic local stand-in for
object-store round-trip latency (S3 time-to-first-byte is commonly
10-100 ms). The handler's state is just ``(root, latency)``, so the
filesystem pickles into Spark python workers and can be passed anywhere
fsio accepts a filesystem (orc_scan's task closure, the orcx
``filesystem`` option).

Purpose: measure — not just assert — that orc_scan's in-task stripe
readahead hides fetch latency, the behavior the reference implements
with its async reader state machine (src/async_arrow_reader.rs:75-190).
See tests/test_fsio.py and scripts/readahead_bench.py.

Module note: unlike fsio this module imports pyarrow.fs eagerly — the
handler must be a module-level subclass of the pyarrow ABC or pickle
could not resolve it worker-side.
"""

from __future__ import annotations

import time

import pyarrow.fs as pafs


class LatencyFileSystemHandler(pafs.FileSystemHandler):
    """Delegates to SubTreeFileSystem(root) with a sleep on input opens."""

    def __init__(self, root: str, latency_s: float):
        self.root, self.latency = root, float(latency_s)

    def _base(self) -> pafs.SubTreeFileSystem:
        return pafs.SubTreeFileSystem(self.root, pafs.LocalFileSystem())

    def get_type_name(self):
        return "latency"

    def get_file_info(self, paths):
        return self._base().get_file_info(paths)

    def get_file_info_selector(self, selector):
        return self._base().get_file_info(selector)

    def create_dir(self, path, recursive):
        self._base().create_dir(path, recursive=recursive)

    def delete_dir(self, path):
        self._base().delete_dir(path)

    def delete_dir_contents(self, path, missing_dir_ok=False):
        self._base().delete_dir_contents(path, missing_dir_ok=missing_dir_ok)

    def delete_root_dir_contents(self):
        raise NotImplementedError("refusing to clear the subtree root")

    def delete_file(self, path):
        self._base().delete_file(path)

    def move(self, src, dest):
        self._base().move(src, dest)

    def copy_file(self, src, dest):
        self._base().copy_file(src, dest)

    def open_input_stream(self, path):
        time.sleep(self.latency)
        return self._base().open_input_stream(path)

    def open_input_file(self, path):
        time.sleep(self.latency)
        return self._base().open_input_file(path)

    def open_output_stream(self, path, metadata=None):
        return self._base().open_output_stream(path)

    def open_append_stream(self, path, metadata=None):
        raise NotImplementedError("append is not part of the IO seam")

    def normalize_path(self, path):
        return path


def make_latency_filesystem(root: str, latency_s: float) -> pafs.PyFileSystem:
    return pafs.PyFileSystem(LatencyFileSystemHandler(root, latency_s))
