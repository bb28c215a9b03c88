"""Zero-copy-ish loading of Arrow embedding columns into numpy.

``list<float>`` / ``fixed_size_list<float>`` columns reach batches as
Arrow list arrays; ``to_pylist()`` materializes a Python list per row —
O(rows × dim) PyObject churn. This helper goes through
``flatten().to_numpy()`` instead (one buffer view + one reshape) and only
falls back to the slow path for ragged rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def vectors_to_numpy(col, dtype=np.float32) -> np.ndarray:
    """(rows, dim) ndarray from an Arrow list-of-float column.

    Assumes non-null, equal-length rows (embedding columns); ragged input
    falls back to ``to_pylist`` which will raise on truly ragged shapes.
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_fixed_size_list(arr.type):
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), arr.type.list_size).astype(dtype, copy=False)
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        offsets = arr.offsets.to_numpy()
        widths = np.diff(offsets)
        if len(widths) and (widths == widths[0]).all():
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(len(arr), int(widths[0])).astype(dtype, copy=False)
    return np.array(arr.to_pylist(), dtype=dtype)
