"""Arrow-batched vector kernels: centroid scoring and SQ8/PQ encoding.

Why this module exists (r16 optimization round): the JVM expression forms of
these kernels — ``transform(<nested literal array>, c -> aggregate(zip_with(
vec, c, ...)))`` — have two structural costs that the guide (§1.2, §4.2)
says to attack first:

- **Catalyst analysis**: a quantizer bank is 512–1024 literal nodes; the
  expression is duplicated per consumer branch (enc/q sides of the PQ join,
  a/b sides of the pair join), so analyzing one query walks 50–90 KB of
  plan — measured 2–12 s of DRIVER time per build at any data size.
- **Interpreted execution**: higher-order functions are CodegenFallback, so
  every (row, cell, dim) product runs on the interpreted expression path
  with per-pair array allocation.

Here the same arithmetic runs once per Arrow batch in numpy (``mapInArrow``
— NOT ``mapInPandas``: the pandas→Arrow output conversion coerces NaN to
NULL, probed, while explicit pyarrow construction keeps NaN as NaN exactly
like the JVM fold). Bit-exactness with the JVM expressions (and hence with
the DuckDB oracles) is preserved by construction:

- The float fold ``aggregate(zip_with(v, c, (x, y) -> double(x) * double(y)),
  0.0, (acc, x) -> acc + x)`` is re-expressed as a **sequential-in-dimension**
  accumulation ``acc += v[:, d] * c[d]`` for d = 0..dim-1, vectorized across
  ROWS. Each row's additions happen in exactly the JVM's order with the
  same IEEE-754 double ops (numpy does not fuse multiply-add), so results
  are bit-identical — including NaN propagation and signed zeros. NEVER
  replace this loop with ``np.dot``/``np.einsum``/``M @ C``: BLAS reorders
  the summation (pairwise/SIMD) and the low bits can diverge.
- Degenerate inputs mirror the expression forms bit-for-bit (probed in
  tests/test_vector_kernels.py): a NULL or wrong-length vector scores a
  |cells|-array of NULLs (``zip_with`` pads the short side, the fold goes
  NULL); PQ codes are ALWAYS an M-array with 0 for every subspace whose
  slice is incomplete (the NULL-distance struct argmin ties to code 0);
  LUT rows are K NULLs for incomplete slices; vectors LONGER than the bank
  dim still PQ-encode their first M*dsub dims (slice semantics) while
  centroid scores go NULL (zip padding).
- The integer SQ8/PQ arithmetic (clamp → floor-scale, L2 code argmin, LUT
  inner products) is exact in int64 — order-independent — with the one
  float subtlety handled explicitly: Spark's ``least(greatest(x, -1), 1)``
  maps NaN to 1.0 (greatest/least treat NaN as largest), so the kernel
  does the same before quantizing.

Only the columns the kernel needs should cross the Python boundary (callers
select first — guide §4.1); input columns pass through zero-copy.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _seq_scores(mat: np.ndarray, bank: np.ndarray) -> np.ndarray:
    """Sequential-in-dim centroid scores: (n, dim) x (cells, dim) -> (n, cells).

    acc starts at 0.0 and accumulates ``mat[:, d] * bank[:, d]`` one
    dimension at a time — per (row, cell) the exact IEEE op sequence of the
    JVM fold. Inputs must already be float64.
    """
    n, dim = mat.shape
    acc = np.zeros((n, bank.shape[0]), dtype=np.float64)
    for d in range(dim):
        acc += mat[:, d : d + 1] * bank[None, :, d]
    return acc


def _seq_self_dot(mat: np.ndarray) -> np.ndarray:
    """Sequential self-fold dot(v, v) per row (for norms)."""
    n, dim = mat.shape
    acc = np.zeros(n, dtype=np.float64)
    for d in range(dim):
        acc += mat[:, d] * mat[:, d]
    return acc


def _sq8_quantize(mat: np.ndarray, scale: int) -> np.ndarray:
    """floor(clamp(x, -1, 1) * scale) as int64, with NaN -> +1.0 first
    (Spark's least/greatest treat NaN as the largest double)."""
    clamped = np.clip(mat, -1.0, 1.0)
    clamped = np.where(np.isnan(mat), 1.0, clamped)
    return np.floor(clamped * float(scale)).astype(np.int64)


def with_vector_features(
    df: DataFrame,
    vec_col: str,
    banks: dict[str, list[list[float]]] | None = None,
    norm_col: str | None = None,
    sq8_col: str | None = None,
    sq8_scale: int = 127,
    pq_books: list[list[list[int]]] | None = None,
    pq_codes_col: str = "codes",
    pq_lut_col: str | None = None,
    pq_lut_mod: int | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """Append vector-derived feature columns in ONE Arrow pass.

    - ``banks``: {out_col: cells x dim unit-centroid matrix} — each out_col
      becomes array<double> of sequential-fold scores (elements NULL when
      the row's vector is NULL or its length != the bank's dim).
    - ``norm_col``: sqrt of the sequential self-fold (any length; NULL for
      a NULL vector, 0.0 for the empty one — like ``norm()``).
    - ``sq8_col``: int8-range scalar quantization of the full vector,
      array<bigint>, any length (row-wise — matches ``_sq8``).
    - ``pq_books``: M x K x dsub integer codebooks; emits ``pq_codes_col``
      (array<int>, per-subspace argmin-L2 code ids, first-min tie-break,
      0 for incomplete subspaces) and — when ``pq_lut_col`` is set — the
      M x K ADC lookup table (array<array<bigint>>). ``pq_lut_mod``
      restricts LUT computation to rows with ``id_col % pq_lut_mod == 0``
      (the probe-query side); other rows get a NULL lut — callers must
      only consume the lut on rows passing that filter.

    All input columns pass through zero-copy; the new columns are appended
    in the order listed above. The Spark plan contains ONE MapInArrow/
    PythonMapInArrow node instead of the literal-bank expression trees.
    """
    from inspig_etl_spark.pyfiles import ensure_shipped

    ensure_shipped(df.sparkSession)

    bank_items = [
        (name, np.asarray(m, dtype=np.float64)) for name, m in (banks or {}).items()
    ]
    books_arr = (
        [np.asarray(b, dtype=np.int64) for b in pq_books] if pq_books else None
    )
    n_books = len(books_arr) if books_arr else 0
    pq_k = books_arr[0].shape[0] if books_arr else 0

    fields = list(df.schema.fields)
    for name, _m in bank_items:
        fields.append(T.StructField(name, T.ArrayType(T.DoubleType()), True))
    if norm_col:
        fields.append(T.StructField(norm_col, T.DoubleType(), True))
    if sq8_col:
        fields.append(T.StructField(sq8_col, T.ArrayType(T.LongType()), True))
    if books_arr:
        fields.append(T.StructField(pq_codes_col, T.ArrayType(T.IntegerType()), True))
        if pq_lut_col:
            fields.append(
                T.StructField(
                    pq_lut_col, T.ArrayType(T.ArrayType(T.LongType())), True
                )
            )
    out_schema = T.StructType(fields)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            n = batch.num_rows
            names = batch.schema.names
            arr = batch.column(names.index(vec_col))
            # Offsets/values give a zero-copy dense view; rows are grouped
            # by length so each group is one (rows, len) float64 matrix.
            null_mask = arr.is_null().to_numpy(zero_copy_only=False)
            offsets = arr.offsets.to_numpy().astype(np.int64)
            values = arr.values.to_numpy(zero_copy_only=False)
            # Element-level NULLs (a non-NULL vector with a NULL slot) are
            # rare but must mirror the JVM expressions exactly (probed in
            # tests/test_vector_kernels.py): any NULL element makes every
            # FLOAT fold NULL (NULL * c -> NULL, acc + NULL -> NULL), while
            # the SQ8 clamp quantizes it to -127 — Spark's greatest/least
            # SKIP null arguments, so least(greatest(NULL, -1.0), 1.0)
            # = -1.0 — and PQ codes/LUT then compute normally from that.
            # Track the child validity separately from the NaN that
            # to_numpy emits for it, and pin the slot to -1.0 so the
            # quantization path sees what the JVM clamp sees.
            if arr.values.null_count:
                elem_null = arr.values.is_null().to_numpy(zero_copy_only=False)
                values = np.where(elem_null, -1.0, values)
            else:
                elem_null = None
            lens = np.diff(offsets)
            lens = np.where(null_mask, -1, lens)

            out_scores = {
                name: [[None] * m.shape[0]] * n for name, m in bank_items
            }
            out_norm: list = [None] * n
            out_qz: list = [None] * n
            out_codes: list = [[0] * n_books] * n
            none_lut = [[None] * pq_k] * n_books if books_arr else None
            out_lut: list = [none_lut] * n
            if pq_lut_col and pq_lut_mod is not None:
                ids = batch.column(names.index(id_col)).to_numpy(
                    zero_copy_only=False
                )
                lut_want_all = ids % pq_lut_mod == 0
                for i in np.nonzero(~lut_want_all)[0]:
                    out_lut[i] = None
            else:
                lut_want_all = np.ones(n, dtype=bool)

            for length in np.unique(lens):
                idx = np.nonzero(lens == length)[0]
                if length < 0:
                    continue
                if length == 0:
                    for i in idx:
                        out_norm[i] = 0.0
                        out_qz[i] = []
                    continue
                gather = offsets[idx, None] + np.arange(length)[None, :]
                mat = values[gather].astype(np.float64)
                # (rows, length) element-null map for this group; any_null
                # rows take the JVM NULL-propagation results instead of the
                # vectorized group arithmetic.
                nullm = elem_null[gather] if elem_null is not None else None
                any_null = nullm.any(axis=1) if nullm is not None else None
                for name, m in bank_items:
                    if length == m.shape[1]:
                        sc = _seq_scores(mat, m)
                        for j, i in enumerate(idx):
                            if any_null is not None and any_null[j]:
                                continue  # keep the all-NULL default
                            out_scores[name][i] = sc[j]
                if norm_col:
                    nr = np.sqrt(_seq_self_dot(mat))
                    for j, i in enumerate(idx):
                        if any_null is not None and any_null[j]:
                            continue  # NULL norm (default)
                        out_norm[i] = float(nr[j])
                if sq8_col or books_arr:
                    # NULL elements were pinned to -1.0 above, so they
                    # quantize to -127 exactly like the null-skipping JVM
                    # clamp; codes and LUT below then need no special case.
                    qz = _sq8_quantize(mat, sq8_scale)
                    if sq8_col:
                        for j, i in enumerate(idx):
                            out_qz[i] = qz[j]
                    if books_arr:
                        codes = np.zeros((len(idx), n_books), dtype=np.int32)
                        want = lut_want_all[idx]
                        row_luts = (
                            [
                                [[None] * pq_k] * n_books if w else None
                                for w in want
                            ]
                            if pq_lut_col
                            else None
                        )
                        off = 0
                        for mi, book in enumerate(books_arr):
                            dsub = book.shape[1]
                            if off + dsub <= length:
                                sub = qz[:, off : off + dsub]
                                # (rows, K) exact integer L2; argmin = first min
                                diff = sub[:, None, :] - book[None, :, :]
                                dists = np.sum(diff * diff, axis=2)
                                codes[:, mi] = np.argmin(dists, axis=1)
                                if pq_lut_col:
                                    lt = sub @ book.T  # exact int64
                                    for j, w in enumerate(want):
                                        if w:
                                            row = list(row_luts[j])
                                            row[mi] = lt[j]
                                            row_luts[j] = row
                            off += dsub
                        for j, i in enumerate(idx):
                            out_codes[i] = codes[j]
                            if pq_lut_col and want[j]:
                                out_lut[i] = row_luts[j]

            cols = list(batch.columns)
            for name, m in bank_items:
                cols.append(
                    pa.array(out_scores[name], type=pa.list_(pa.float64()))
                )
            if norm_col:
                cols.append(pa.array(out_norm, type=pa.float64()))
            if sq8_col:
                cols.append(pa.array(out_qz, type=pa.list_(pa.int64())))
            if books_arr:
                cols.append(pa.array(out_codes, type=pa.list_(pa.int32())))
                if pq_lut_col:
                    cols.append(
                        pa.array(out_lut, type=pa.list_(pa.list_(pa.int64())))
                    )
            yield pa.RecordBatch.from_arrays(cols, names=names + _new_names)

    _new_names = [name for name, _m in bank_items]
    if norm_col:
        _new_names.append(norm_col)
    if sq8_col:
        _new_names.append(sq8_col)
    if books_arr:
        _new_names.append(pq_codes_col)
        if pq_lut_col:
            _new_names.append(pq_lut_col)

    return df.mapInArrow(kernel, schema=out_schema)


def dot_unrolled(a, b, dim: int):
    """The sequential dot fold as a STATIC codegen-able expression:
    ``0.0 + a[0]*b[0] + a[1]*b[1] + ...`` — left-associated, so the IEEE
    op sequence is identical to the ``aggregate(zip_with(...))`` fold
    (including the leading ``0.0 +``, which differs from a bare sum only
    on a -0.0 first product).

    ONLY valid where both sides are known to have length == ``dim`` (e.g.
    pairs joined on a non-NULL IVF cell, which is derivable only from a
    full-length score — see with_vector_features). Out-of-range access uses
    ``F.get`` (NULL, not an ANSI error), so a slipped-through short vector
    yields NULL — the padded-zip fold's result for mismatched lengths —
    rather than a crash; equal-but-short pairs are the one case that would
    diverge, so callers must guarantee the length invariant.

    MEASURED SLOWER than the HOF fold at dim=64 (r16: 6.4 s vs 3.5 s on the
    252k-pair semdedup join; +30% on the IVF kNN join) — 64 F.get
    extractions each re-check null/bounds where the fold traverses the
    array once. Kept (with its bit-identity test) as the documented
    negative result and for narrow-dim folds like the PQ_M=8 ADC lookup
    sum, where the unrolled form DID win as part of the IVF-PQ rebuild.
    """
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.get(a, F.lit(i)).cast("double") * F.get(b, F.lit(i)).cast(
            "double"
        )
    return acc


def dot_unrolled_int(a, b, dim: int):
    """Integer twin of :func:`dot_unrolled` (exact, order-free — unrolled
    purely so whole-stage codegen applies instead of the interpreted HOF).
    Same length contract as :func:`dot_unrolled`."""
    acc = F.lit(0).cast("bigint")
    for i in range(dim):
        acc = acc + F.get(a, F.lit(i)) * F.get(b, F.lit(i))
    return acc
