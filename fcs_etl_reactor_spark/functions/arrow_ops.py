"""mapInArrow surface (SURVEY.md §2.12): the zero-copy sibling of
mapInPandas — Python receives raw pyarrow RecordBatches, skipping the
Arrow→pandas conversion entirely.

When to pick which Python escape hatch:
- built-in expressions: always first (JVM codegen, no transfer);
- pandas_udf / applyInPandas: per-group model fits, code that wants
  pandas semantics (beads.py, gates.py);
- mapInArrow: per-batch numeric kernels where the pandas round-trip
  is measurable overhead — NumPy views the Arrow buffers directly.

The kernel below L2-normalizes fixed-width embedding vectors. It is a
DEMO of the surface (q90's expression pipeline covers the same math
in codegen); the shape to reuse is: values-buffer → (rows, dim)
NumPy view → vectorized kernel → one new Arrow array, no per-row
Python and no pandas objects anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def l2_normalize_arrow(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Append `unit` = vec / ||vec||₂ via mapInArrow (batch-level
    NumPy over the Arrow list buffers; zero-vector rows pass through
    unchanged). Schema gains one list<float64> column; all other
    columns are forwarded untouched.
    """
    import pyarrow as pa

    out_fields = [
        (f.name, f.dataType.simpleString()) for f in df.schema.fields
    ] + [("unit", "array<double>")]
    out_schema = ", ".join(f"{n} {t}" for n, t in out_fields)

    def normalize(batches):
        import numpy as np

        for batch in batches:
            col = batch.column(batch.schema.get_field_index(vec_col))
            if isinstance(col, pa.ChunkedArray):  # pragma: no cover
                col = col.combine_chunks()
            lst = col.cast(pa.list_(pa.float64()))
            flat = np.asarray(lst.flatten())
            offsets = np.asarray(lst.offsets)
            widths = np.diff(offsets)
            if len(widths) and widths.min() == widths.max():
                # fixed-width fast path: one (rows, dim) view, one BLAS-ish pass
                mat = flat.reshape(len(widths), widths[0])
                norms = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
                unit = np.where(norms > 0, mat / np.where(norms == 0, 1, norms), mat)
                unit_arr = pa.array(list(unit), type=pa.list_(pa.float64()))
            else:  # ragged fallback, still batch-vectorized per row
                unit_rows = []
                for s, e in zip(offsets[:-1], offsets[1:]):
                    v = flat[s:e]
                    n = np.sqrt((v * v).sum())
                    unit_rows.append(v / n if n > 0 else v)
                unit_arr = pa.array([list(r) for r in unit_rows], type=pa.list_(pa.float64()))
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)] + [unit_arr],
                names=[f.name for f in batch.schema] + ["unit"],
            )

    return df.mapInArrow(normalize, out_schema)
