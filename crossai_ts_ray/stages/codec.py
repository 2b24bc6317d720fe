"""Gorilla-style XOR (float64 values) + delta-of-delta (int64 offsets)
compression, vectorized NumPy, lossless.

Bit formats (big-endian bitstream, MSB-first; from the public Gorilla paper,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database", VLDB 2015):

delta-of-delta (int64):
  [64 bits  first value, two's complement]
  per subsequent value (dod = delta_i - delta_{i-1}; delta_0 := 0):
    '0'                          dod == 0
    '10'   + 7  bits (dod+63)    dod in [-63, 64]
    '110'  + 9  bits (dod+255)   dod in [-255, 256]
    '1110' + 12 bits (dod+2047)  dod in [-2047, 2048]
    '1111' + 64 bits raw dod
  Arithmetic wraps mod 2^64 (int64 overflow-safe round-trips).

Gorilla XOR (float64 via their IEEE-754 bit patterns; NaN/Inf/-0.0 safe):
  [64 bits first value]
  per subsequent value (x = bits_i XOR bits_{i-1}):
    '0'                                      x == 0
    '10' + mb bits (reuse previous window)   lz >= win_lz and tz >= win_tz
    '11' + 5 bits lz (capped 31) + 6 bits (mb-1) + mb bits; sets the window

Encode is vectorized (XOR / clz / ctz via byte LUTs, bit scatter by width
class); the Gorilla control-flow walk is a tight scalar loop over
precomputed arrays (the window chain is inherently sequential).  Decode is a
sequential bit walk -- used by round-trip tests and the (cold) decode path.

The reference has no codec; this is a north-rule addition (BASELINE.json:14).
Engine placement: a stateful actor-pool ``map_batches`` stage (CodecStage)
compressing tier rollup columns into per-(source, segment) binary blobs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# leading zeros of a byte: 8 for 0, else 8 - bit_length
_CLZ_LUT = np.array(
    [8 if i == 0 else 8 - int(i).bit_length() for i in range(256)], np.int64
)
_CTZ_LUT = np.array(
    [8 if i == 0 else (i & -i).bit_length() - 1 for i in range(256)], np.int64
)


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (returns 64 for 0)."""
    b = x.astype(">u8").view(np.uint8).reshape(-1, 8)
    nz = b != 0
    first = np.argmax(nz, axis=1)
    any_nz = nz.any(axis=1)
    lz = 8 * first + _CLZ_LUT[b[np.arange(len(x)), first]]
    return np.where(any_nz, lz, 64)


def _ctz64(x: np.ndarray) -> np.ndarray:
    b = x.astype("<u8").view(np.uint8).reshape(-1, 8)
    nz = b != 0
    first = np.argmax(nz, axis=1)
    any_nz = nz.any(axis=1)
    tz = 8 * first + _CTZ_LUT[b[np.arange(len(x)), first]]
    return np.where(any_nz, tz, 64)


def _pack(vals: np.ndarray, widths: np.ndarray) -> bytes:
    """Pack (value, bit-width) pairs MSB-first into bytes, vectorized per
    distinct width."""
    total = int(widths.sum())
    bits = np.zeros(((total + 7) // 8) * 8, dtype=np.uint8)
    pos = np.zeros(len(vals), dtype=np.int64)
    np.cumsum(widths[:-1], out=pos[1:])
    for w in np.unique(widths):
        w = int(w)
        if w == 0:
            continue
        m = widths == w
        v = vals[m]
        shifts = np.arange(w - 1, -1, -1, dtype=np.uint64)
        rows = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
        idx = pos[m][:, None] + np.arange(w, dtype=np.int64)[None, :]
        bits[idx.ravel()] = rows.ravel()
    return np.packbits(bits).tobytes()


class _BitReader:
    """Sequential bit reader: unpacked bit array + per-field packbits
    (each read costs O(field width), independent of total stream size)."""

    __slots__ = ("bits", "pos")

    _POW = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)).astype(np.uint64)

    def __init__(self, buf: bytes):
        self.bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8)).astype(np.uint64)
        self.pos = 0

    def read(self, n: int) -> int:
        p = self.pos
        self.pos = p + n
        return int(self.bits[p : p + n] @ self._POW[64 - n :])

    def read1(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b


def dod_encode(values: np.ndarray) -> bytes:
    """Delta-of-delta encode an int64 array (fully vectorized)."""
    v = np.asarray(values, dtype=np.int64)
    n = len(v)
    if n == 0:
        return b""
    u = v.view(np.uint64)
    with np.errstate(over="ignore"):
        delta = np.empty(n, dtype=np.uint64)
        delta[0] = 0
        np.subtract(u[1:], u[:-1], out=delta[1:])
        dod = np.empty(n - 1, dtype=np.uint64) if n > 1 else np.zeros(0, np.uint64)
        if n > 1:
            np.subtract(delta[1:], delta[:-1], out=dod)
    sdod = dod.view(np.int64)
    vals = np.empty(n, dtype=np.uint64)
    widths = np.empty(n, dtype=np.int64)
    vals[0] = u[0]
    widths[0] = 64
    if n > 1:
        c0 = sdod == 0
        c1 = (sdod >= -63) & (sdod <= 64) & ~c0
        c2 = (sdod >= -255) & (sdod <= 256) & ~c0 & ~c1
        c3 = (sdod >= -2047) & (sdod <= 2048) & ~c0 & ~c1 & ~c2
        c4 = ~(c0 | c1 | c2 | c3)
        w = np.empty(n - 1, dtype=np.int64)
        pv = np.empty(n - 1, dtype=np.uint64)
        w[c0] = 1
        pv[c0] = 0b0
        w[c1] = 2 + 7
        pv[c1] = (np.uint64(0b10) << np.uint64(7)) | (sdod[c1] + 63).astype(np.uint64)
        w[c2] = 3 + 9
        pv[c2] = (np.uint64(0b110) << np.uint64(9)) | (sdod[c2] + 255).astype(np.uint64)
        w[c3] = 4 + 12
        pv[c3] = (np.uint64(0b1110) << np.uint64(12)) | (sdod[c3] + 2047).astype(np.uint64)
        # 4-bit prefix + 64 raw bits = 68 bits: store prefix and payload as
        # two entries to stay within uint64 packing
        vals[1:] = pv
        widths[1:] = w
        if c4.any():
            # split rows: prefix entry (0b1111, 4 bits) + payload (64 bits)
            idx = np.flatnonzero(c4) + 1
            vals_l, widths_l = [], []
            prev = 0
            for i in idx:
                vals_l.append(vals[prev:i])
                widths_l.append(widths[prev:i])
                vals_l.append(np.array([0b1111, dod[i - 1]], dtype=np.uint64))
                widths_l.append(np.array([4, 64], dtype=np.int64))
                prev = i + 1
            vals_l.append(vals[prev:])
            widths_l.append(widths[prev:])
            vals = np.concatenate(vals_l)
            widths = np.concatenate(widths_l)
    return _pack(vals, widths)


def dod_decode(buf: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    r = _BitReader(buf)
    out = np.empty(n, dtype=np.uint64)
    out[0] = r.read(64)
    delta = 0
    M = (1 << 64) - 1
    for i in range(1, n):
        if r.read1() == 0:
            dod = 0
        elif r.read1() == 0:
            dod = r.read(7) - 63
        elif r.read1() == 0:
            dod = r.read(9) - 255
        elif r.read1() == 0:
            dod = r.read(12) - 2047
        else:
            dod = r.read(64)
        delta = (delta + dod) & M
        out[i] = (int(out[i - 1]) + delta) & M
    return out.view(np.int64)


def gorilla_encode(values: np.ndarray) -> bytes:
    """Gorilla XOR encode a float64 array.  XOR/clz/ctz are vectorized; the
    window chain is a scalar walk emitting (value, width) pairs."""
    v = np.ascontiguousarray(np.asarray(values, dtype=np.float64))
    n = len(v)
    if n == 0:
        return b""
    u = v.view(np.uint64)
    x = np.empty(n, dtype=np.uint64)
    x[0] = 0
    np.bitwise_xor(u[1:], u[:-1], out=x[1:])
    lz = np.minimum(_clz64(x), 31)
    tz = _ctz64(x)
    vals = np.empty(2 * n + 1, dtype=np.uint64)
    widths = np.empty(2 * n + 1, dtype=np.int64)
    vals[0] = u[0]
    widths[0] = 64
    k = 1
    win_lz, win_tz, win_mb = -1, -1, 0  # invalid window
    xl, lzl, tzl = x.tolist(), lz.tolist(), tz.tolist()
    for i in range(1, n):
        xi = xl[i]
        if xi == 0:
            vals[k] = 0
            widths[k] = 1
            k += 1
            continue
        li, ti = lzl[i], tzl[i]
        if win_lz >= 0 and li >= win_lz and ti >= win_tz:
            # '10' + meaningful bits in the stored window (two pack entries:
            # 2 + win_mb can exceed 64 bits when win_mb == 64)
            vals[k] = 0b10
            widths[k] = 2
            vals[k + 1] = xi >> win_tz
            widths[k + 1] = win_mb
            k += 2
        else:
            mb = 64 - li - ti
            # '11' + 5 bits lz + 6 bits (mb-1); then mb payload bits as a
            # second entry (total can exceed 64 bits)
            vals[k] = (0b11 << 11) | (li << 6) | (mb - 1)
            widths[k] = 2 + 5 + 6
            vals[k + 1] = xi >> ti
            widths[k + 1] = mb
            k += 2
            win_lz, win_tz, win_mb = li, ti, mb
    return _pack(vals[:k], widths[:k])


def gorilla_decode(buf: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    r = _BitReader(buf)
    out = np.empty(n, dtype=np.uint64)
    out[0] = r.read(64)
    win_tz, win_mb = 0, 0
    have_win = False
    for i in range(1, n):
        if r.read1() == 0:
            out[i] = out[i - 1]
            continue
        if r.read1() == 0:
            if not have_win:
                raise ValueError("corrupt stream: window reuse before set")
            x = r.read(win_mb) << win_tz
        else:
            lzi = r.read(5)
            mb = r.read(6) + 1
            win_tz = 64 - lzi - mb
            win_mb = mb
            have_win = True
            x = r.read(mb) << win_tz
        out[i] = int(out[i - 1]) ^ x
    return out.view(np.float64)


# ---------------------------------------------------------------------------
# Ray stage: actor-pool compression of tier rollups
# ---------------------------------------------------------------------------

class CodecStage:
    """Stateful actor: compresses rollup batches into per-(source, batch)
    segments.  int64/int32 columns -> delta-of-delta; float64 -> Gorilla.

    Used as ``ds.map_batches(CodecStage, fn_constructor_kwargs=...,
    concurrency=N, batch_size=B)`` -- construction cost (LUTs, column plan)
    is paid once per actor (SURVEY.md §2.5).
    """

    def __init__(self, int_cols: list[str], float_cols: list[str], key_col: str = "source"):
        self.int_cols = int_cols
        self.float_cols = float_cols
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch.combine_chunks()
        if t.num_rows == 0:
            return self._empty()
        # one segment per source within the batch (sorted for locality)
        t = t.sort_by([(self.key_col, "ascending"), ("bucket", "ascending")])
        keys = t[self.key_col].to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        ).tolist() + [t.num_rows]
        rows = []
        for a, b in zip(bounds, bounds[1:]):
            seg = t.slice(a, b - a)
            row = {
                "source": str(keys[a]),
                "n": b - a,
                "bucket_lo": seg["bucket"][0].as_py(),
                "bucket_hi": seg["bucket"][-1].as_py(),
            }
            raw_bytes = 0
            enc_bytes = 0
            for c in self.int_cols:
                arr = seg[c].to_numpy(zero_copy_only=False).astype(np.int64)
                blob = dod_encode(arr)
                row[f"enc_{c}"] = blob
                raw_bytes += arr.nbytes
                enc_bytes += len(blob)
            for c in self.float_cols:
                arr = seg[c].to_numpy(zero_copy_only=False).astype(np.float64)
                blob = gorilla_encode(arr)
                row[f"enc_{c}"] = blob
                raw_bytes += arr.nbytes
                enc_bytes += len(blob)
            row["raw_bytes"] = raw_bytes
            row["enc_bytes"] = enc_bytes
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=self._schema())

    def _schema(self) -> pa.Schema:
        fields = [
            ("source", pa.string()),
            ("n", pa.int64()),
            ("bucket_lo", pa.int64()),
            ("bucket_hi", pa.int64()),
        ]
        for c in self.int_cols + self.float_cols:
            fields.append((f"enc_{c}", pa.binary()))
        fields += [("raw_bytes", pa.int64()), ("enc_bytes", pa.int64())]
        return pa.schema(fields)

    def _empty(self) -> pa.Table:
        return pa.Table.from_pylist([], schema=self._schema())


def decode_segment_column(row: dict, col: str, is_float: bool) -> np.ndarray:
    blob, n = row[f"enc_{col}"], row["n"]
    return gorilla_decode(blob, n) if is_float else dod_decode(blob, n)


def compress_rollup(rollup_ds, concurrency: int = 4, batch_size: int = 8192):
    """Tier rollup Dataset -> compressed segment Dataset (actor pool).

    On a cluster with fewer than 2 CPUs the actor pool is replaced by a task
    pool: an actor pins its CPU for the pipeline's lifetime, so on a 1-CPU
    cluster the upstream read tasks can never schedule and the pipeline
    deadlocks.  Stateless-task mode re-pays CodecStage construction per task,
    which is negligible (LUTs + a column list) next to the deadlock."""
    int_cols = ["bucket", "count", "sum", "min", "max", "tok_count", "tok_sum", "tok_min", "tok_max"]
    float_cols = ["mean", "p50", "p99", "tok_mean", "tok_p50", "tok_p99"]
    import ray as _ray

    if int(_ray.cluster_resources().get("CPU", 2)) < 2:
        stage = CodecStage(int_cols=int_cols, float_cols=float_cols)
        return rollup_ds.map_batches(
            stage, batch_format="pyarrow", batch_size=batch_size
        )
    return rollup_ds.map_batches(
        CodecStage,
        fn_constructor_kwargs={"int_cols": int_cols, "float_cols": float_cols},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def decompress_segments(segs: pa.Table) -> pa.Table:
    """Segment table (CodecStage output) -> plain rollup rows, bitwise
    identical to the pre-compression tier (the decode side of the
    retention-store representation; dtypes restored per ROLLUP_SCHEMA)."""
    from ..schema import ROLLUP_SCHEMA

    int_cols = ["bucket", "count", "sum", "min", "max", "tok_count", "tok_sum", "tok_min", "tok_max"]
    float_cols = ["mean", "p50", "p99", "tok_mean", "tok_p50", "tok_p99"]
    rows = segs.to_pylist()
    if not rows:
        return pa.Table.from_pylist([], schema=ROLLUP_SCHEMA)
    src = np.repeat(
        np.array([r["source"] for r in rows], dtype=object),
        np.array([r["n"] for r in rows], dtype=np.int64),
    )
    cols: dict[str, np.ndarray] = {
        c: np.concatenate([dod_decode(r[f"enc_{c}"], r["n"]) for r in rows])
        for c in int_cols
    }
    cols.update(
        {
            c: np.concatenate([gorilla_decode(r[f"enc_{c}"], r["n"]) for r in rows])
            for c in float_cols
        }
    )
    out = {"source": pa.array(src, pa.string())}
    for name, typ in zip(ROLLUP_SCHEMA.names, ROLLUP_SCHEMA.types):
        if name == "source":
            continue
        out[name] = pa.array(cols[name]).cast(typ)
    return pa.table(out, schema=ROLLUP_SCHEMA)
