"""DANN v2 binary interop: read/write the reference's ``.diskann`` layout.

Clean-room implementation from the documented layout
(``/root/reference/rust_lib/src/file_format.rs:1-18`` doc comment):

    [32-byte header] magic "DANN" | version u32 (=2) | num_vectors u32 |
        dimension u32 | max_degree u32 | num_entry_points u32 |
        metric u8 (0=L2, 1=IP) | 3 pad bytes | build_complexity u32
    [entry point ids: num_entry_points x u32]
    [vectors: num_vectors x dimension x f32]
    [adjacency: num_vectors x max_degree x u32, u32::MAX padding]
    optional [b"SQ8\\0" | dim u32 | qlen u64 | mins f32 x dim |
        scales f32 x dim | codes u8 x qlen]
    optional [b"PQC\\0" | m u32 | ksub u32 | dsub u32 | qlen u64 |
        codebooks f32 x (m*ksub*dsub) | codes u8 x qlen]
    (all little-endian)

The SQ8 and PQC trailing sections are THIS ENGINE'S extensions (the
reference's v2 layout ends at the adjacency segment): reference tooling
reads the f32 vector block and ignores trailing bytes, while this engine's
mmap server pages the u8 codes instead of the f32 block — 4x (SQ8) / up to
32x (PQ) fewer bytes touched per hop.

The parquet artifact remains the engine's primary format (SURVEY §2.3 R6);
this module exists so indexes can round-trip with reference tooling and be
mmap-served outside Spark.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"DANN"
VERSION = 2
HEADER_SIZE = 32
NO_NEIGHBOR_U32 = 0xFFFFFFFF

_METRIC_TO_U8 = {"l2": 0, "ip": 1}
_U8_TO_METRIC = {0: "l2", 1: "ip"}


def write_dann(
    path: str,
    vectors: np.ndarray,
    neighbors: list[np.ndarray],
    entry_points: list[int],
    metric: str = "l2",
    max_degree: int = 64,
    build_complexity: int = 128,
    sq8: dict | None = None,
    pq: dict | None = None,
) -> None:
    """Write a ``.diskann`` file.  ``sq8`` = {'mins', 'scales', 'codes'}
    (codes = (n, dim) u8) appends the SQ8 trailer; ``pq`` = {'codebooks'
    (m, ksub, dsub) f32, 'codes' (n, m) u8 [, 'rotation' (dim, dim) f32]}
    appends the PQC trailer (OPQC variant when a rotation is present).
    At most one quantization trailer per file."""
    if metric not in _METRIC_TO_U8:
        raise ValueError(f"DANN format supports l2|ip, not {metric!r}")
    x = np.ascontiguousarray(vectors, dtype="<f4")
    n, dim = x.shape if x.ndim == 2 else (0, 0)
    eps = np.asarray(entry_points, dtype="<u4")
    adj = np.full((n, max_degree), NO_NEIGHBOR_U32, dtype="<u4")
    for i, nb in enumerate(neighbors):
        m = min(len(nb), max_degree)
        adj[i, :m] = np.asarray(nb[:m], dtype="<u4")
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(
            struct.pack(
                "<IIIII B 3s I",
                VERSION,
                n,
                dim,
                max_degree,
                len(eps),
                _METRIC_TO_U8[metric],
                b"\x00\x00\x00",
                build_complexity,
            )
        )
        f.write(eps.tobytes())
        f.write(x.tobytes())
        f.write(adj.tobytes())
        if sq8 is not None and pq is not None:
            raise ValueError("at most one quantization trailer (sq8 | pq)")
        if sq8 is not None:
            codes = np.ascontiguousarray(sq8["codes"], dtype=np.uint8)
            f.write(b"SQ8\x00")
            f.write(struct.pack("<I", dim))
            f.write(struct.pack("<Q", codes.size))
            f.write(np.asarray(sq8["mins"], dtype="<f4").tobytes())
            f.write(np.asarray(sq8["scales"], dtype="<f4").tobytes())
            f.write(codes.tobytes())
        if pq is not None:
            books = np.ascontiguousarray(pq["codebooks"], dtype="<f4")
            codes = np.ascontiguousarray(pq["codes"], dtype=np.uint8)
            rot = pq.get("rotation")
            m, ksub, dsub = books.shape
            # OPQC = PQC with a dim*dim rotation between header and
            # codebooks (decode applies R^T); codes encode R @ x
            f.write(b"OPQC" if rot is not None else b"PQC\x00")
            f.write(struct.pack("<III", m, ksub, dsub))
            f.write(struct.pack("<Q", codes.size))
            if rot is not None:
                f.write(np.ascontiguousarray(rot, dtype="<f4").tobytes())
            f.write(books.tobytes())
            f.write(codes.tobytes())


def parse_header(head: bytes) -> dict:
    """Validate + decode the 32-byte DANN header. Raises on bad magic or a
    version this engine doesn't speak — both the full reader and the mmap
    server go through here, so a v1/v3 file fails fast instead of being
    sliced with v2 offsets."""
    if head[:4] != MAGIC:
        raise ValueError("not a DANN file (bad magic)")
    version, n, dim, max_degree, n_eps, metric_u8, _pad, build_l = struct.unpack(
        "<IIIII B 3s I", head[4:HEADER_SIZE]
    )
    if version != VERSION:
        raise ValueError(f"unsupported DANN version {version} (engine supports {VERSION})")
    return {
        "n": n,
        "dim": dim,
        "max_degree": max_degree,
        "n_entry_points": n_eps,
        "metric": _U8_TO_METRIC.get(metric_u8, "l2"),
        "build_complexity": build_l,
    }


def read_dann(path: str) -> dict:
    """Read a ``.diskann`` file into numpy structures."""
    with open(path, "rb") as f:
        data = f.read()
    h = parse_header(data[:HEADER_SIZE])
    n, dim, max_degree, n_eps = h["n"], h["dim"], h["max_degree"], h["n_entry_points"]
    off = HEADER_SIZE
    eps = np.frombuffer(data, dtype="<u4", count=n_eps, offset=off)
    off += n_eps * 4
    vectors = np.frombuffer(data, dtype="<f4", count=n * dim, offset=off).reshape(n, dim)
    off += n * dim * 4
    adj = np.frombuffer(data, dtype="<u4", count=n * max_degree, offset=off).reshape(
        n, max_degree
    )
    off += n * max_degree * 4
    neighbors = [row[row != NO_NEIGHBOR_U32].astype(np.int64) for row in adj]
    sq8 = None
    pq = None
    if len(data) > off + 4 and data[off : off + 4] == b"SQ8\x00":
        sdim = struct.unpack("<I", data[off + 4 : off + 8])[0]
        qlen = struct.unpack("<Q", data[off + 8 : off + 16])[0]
        poff = off + 16
        mins = np.frombuffer(data, dtype="<f4", count=sdim, offset=poff)
        scales = np.frombuffer(data, dtype="<f4", count=sdim, offset=poff + sdim * 4)
        codes = np.frombuffer(
            data, dtype=np.uint8, count=qlen, offset=poff + sdim * 8
        ).reshape(-1, sdim)
        sq8 = {"mins": mins, "scales": scales, "codes": codes}
    elif len(data) > off + 4 and data[off : off + 4] in (b"PQC\x00", b"OPQC"):
        has_rot = data[off : off + 4] == b"OPQC"
        m, ksub, dsub = struct.unpack("<III", data[off + 4 : off + 16])
        qlen = struct.unpack("<Q", data[off + 16 : off + 24])[0]
        poff = off + 24
        rotation = None
        if has_rot:
            rotation = np.frombuffer(
                data, dtype="<f4", count=dim * dim, offset=poff
            ).reshape(dim, dim)
            poff += dim * dim * 4
        books = np.frombuffer(
            data, dtype="<f4", count=m * ksub * dsub, offset=poff
        ).reshape(m, ksub, dsub)
        codes = np.frombuffer(
            data, dtype=np.uint8, count=qlen, offset=poff + m * ksub * dsub * 4
        ).reshape(-1, m)
        pq = {"codebooks": books, "codes": codes}
        if rotation is not None:
            pq["rotation"] = rotation
    return {
        "vectors": vectors,
        "neighbors": neighbors,
        "entry_points": eps.astype(np.int64).tolist(),
        "metric": h["metric"],
        "max_degree": int(max_degree),
        "build_complexity": int(h["build_complexity"]),
        "sq8": sq8,
        "pq": pq,
    }
