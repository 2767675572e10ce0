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

import re
from typing import Callable

import numpy as np
import pyarrow as pa

_LINE_RE = re.compile("\r\n|\r|\n")


def _split_lines_java(text: str) -> list[str]:
    """Split on \\r\\n / \\r / \\n ONLY — Java BufferedReader.readLine
    semantics.  Python ``str.splitlines()`` additionally breaks on
    \\v, \\f, \\x1c-\\x1e, NEL (U+0085) and U+2028/U+2029, which Java
    never does; a NEL inside a tsv field would become a spurious row
    and shift every following line number."""
    if not text:
        return []
    lines = _LINE_RE.split(text)
    if lines[-1] == "" and text[-1] in "\r\n":
        lines.pop()  # a trailing terminator does not open a new line
    return lines


def read_file_as_string(path: str, callback: Callable[[str], None] | None = None) -> str:
    """Reference-parity reader: returns the file content with line
    terminators normalized to '\\n' and NO trailing newline; invokes
    `callback(line)` per line in order (FileUtils.java:16-22)."""
    with open(path, encoding="utf-8", newline="") as f:
        lines = _split_lines_java(f.read())
    if callback is not None:
        for line in lines:
            callback(line)
    return "\n".join(lines)


def read_lines(paths: str | list[str]):
    """Dataset of (file:string, line_no:int64, line:string) — one task
    per file, vectorized line split, deterministic per-file numbering.
    Line semantics are Java BufferedReader's (\\r\\n/\\r/\\n only —
    see `_split_lines_java`)."""
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]

    def split(batch: pa.Table) -> pa.Table:
        out_file, out_no, out_line = [], [], []
        for row in batch.to_pylist():
            data: bytes = row["bytes"]
            text = data.decode("utf-8")
            lines = _split_lines_java(text)
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
