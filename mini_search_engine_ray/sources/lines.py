"""Line-oriented file sources (SURVEY §2 S2).

The reference reads files line-by-line with a per-line callback while
accumulating the full content (`utils/FileUtils.readFileAsString`,
`utils/FileUtils.java:9-31`, callback interface
`utils/ReadFileCallback.java`) — used by the tsv readers and the
document loader (`search/IcsSearchEngine.java:53,70,105`).

Two equivalents here:
  * `read_file_as_string(path, callback)` — exact behavioral parity
    (same return value, same per-line callback order) for driver-side
    utility use.
  * `read_lines(paths)` — the Dataset-native form: (file, line_no,
    line) rows, one read task per file, line numbers deterministic
    (per-file, 0-based), splitting vectorized via pyarrow.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa


def read_file_as_string(path: str, callback: Callable[[str], None] | None = None) -> str:
    """Reference-parity reader: returns the file content with line
    terminators normalized to '\\n' and NO trailing newline; invokes
    `callback(line)` per line in order (FileUtils.java:16-22)."""
    with open(path, encoding="utf-8") as f:
        lines = f.read().splitlines()
    if callback is not None:
        for line in lines:
            callback(line)
    return "\n".join(lines)


def read_lines(paths: str | list[str]):
    """Dataset of (file:string, line_no:int64, line:string) — one task
    per file, vectorized line split, deterministic per-file numbering.
    Line semantics match `str.splitlines()` on \\n/\\r\\n (BufferedReader
    parity for the tsv inputs this feeds)."""
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]

    def split(batch: pa.Table) -> pa.Table:
        out_file, out_no, out_line = [], [], []
        for row in batch.to_pylist():
            data: bytes = row["bytes"]
            text = data.decode("utf-8")
            lines = text.splitlines()
            out_file.extend([row["path"]] * len(lines))
            out_no.append(np.arange(len(lines), dtype=np.int64))
            out_line.extend(lines)
        return pa.table(
            {
                "file": pa.array(out_file, pa.string()),
                "line_no": pa.array(
                    np.concatenate(out_no) if out_no else np.empty(0, np.int64)
                ),
                "line": pa.array(out_line, pa.string()),
            }
        )

    return rd.read_binary_files(paths, include_paths=True).map_batches(
        split, batch_format="pyarrow"
    )
