"""Semi-structured (JSON) field extraction as a pure vectorized map.

Event logs carry a JSON ``props`` column; pulling a typed field out of
it is the first step of almost every ETL pipeline over them.  Arrow has
no JSON kernel in this environment, so the extractor uses the RE2
``extract_regex`` kernel with a field-anchored pattern — the documented
contract is FLAT JSON objects whose values do not themselves contain
the quoted key (true for machine-written event props; a full parser
would swap in simdjson behind the same signature).  DuckDB's
``json_extract`` replays the same value for such objects, which is what
the driver oracle checks.

Scale shape: pure map, one compiled RE2 per call (compiled inside the
kernel), no shuffle, no state.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc


def json_int_field(ds, *, col: str = "props", field: str,
                   out_col: str | None = None):
    """Extract an integer JSON field into ``out_col`` (int64; null when
    the key is absent or non-integer).  Keeps all existing columns."""
    if not field:
        raise ValueError("field must be non-empty")
    out = out_col or field
    # RE2 has no lookahead, so integer-ness is enforced by requiring
    # the JSON value terminator (comma or closing brace) right after
    # the digits — '{"k": 1.5}' correctly yields null, not 1
    pat = '"' + re.escape(field) + r'"\s*:\s*(?P<v>-?[0-9]+)\s*[,}]'

    def apply(t: pa.Table) -> pa.Table:
        s = t[col]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        if t.num_rows == 0:
            return t.append_column(out, pa.array([], pa.int64()))
        ext = pc.extract_regex(s, pattern=pat)
        v = pc.cast(pc.struct_field(ext, "v"), pa.int64())
        return t.append_column(out, v)

    return ds.map_batches(apply, batch_format="pyarrow")
