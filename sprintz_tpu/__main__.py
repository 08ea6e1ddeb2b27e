"""Command-line interface: compress / decompress / info / query on files.

The reference ships no CLI (its main.cpp is a Catch test runner); users
drive it as a library. This framework is also a library first, but a file
CLI closes the last-mile gap for shell pipelines and makes the codec
usable without writing Python:

    python -m sprintz_tpu compress  raw.bin out.spz --ndims 64 --dtype u8
    python -m sprintz_tpu decompress out.spz roundtrip.bin
    python -m sprintz_tpu info       out.spz
    python -m sprintz_tpu query      out.spz --op sum

Container format: compressed files carry a 6-byte self-describing header
(magic ``SPZT1`` + one flags byte encoding codec/elem-size/entropy) in
front of the reference-exact Sprintz stream, because the reference stream
metadata (format.h:35-45 analogue, golden/stream.py:46-61) records ndims
but not element size, forecaster, or entropy stage. ``--raw`` on both
sides skips the container and reads/writes the byte-exact reference
stream instead (then decompress/info/query need --codec/--dtype flags).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

MAGIC = b"SPZT1"
_CODECS = ["delta", "xff"]
_DTYPES = {"u8": 1, "u16": 2}
_ENTROPY = ["none", "huffman"]


def _pack_flags(codec: str, elem_sz: int, entropy: str) -> bytes:
    b = _CODECS.index(codec) | ((elem_sz - 1) << 1) | (
        _ENTROPY.index(entropy) << 2)
    return bytes([b])


def _unpack_flags(b: int) -> tuple[str, int, str]:
    return _CODECS[b & 1], ((b >> 1) & 1) + 1, _ENTROPY[(b >> 2) & 1]


def _read_container(buf: bytes, args) -> tuple[bytes, str, int, str]:
    """Return (stream, codec, elem_sz, entropy) from container or flags."""
    if not args.raw and buf[:5] == MAGIC:
        codec, elem_sz, entropy = _unpack_flags(buf[5])
        return buf[6:], codec, elem_sz, entropy
    if not args.raw:
        print("note: no SPZT1 container header; treating input as a raw "
              "reference stream (honoring --codec/--dtype/--entropy)",
              file=sys.stderr)
    return buf, args.codec, _DTYPES[args.dtype], args.entropy


def _cmd_compress(args) -> int:
    from .api import SprintzCodec

    elem_sz = _DTYPES[args.dtype]
    dt = np.uint8 if elem_sz == 1 else np.uint16
    data = np.fromfile(args.infile, dtype=dt)
    if data.size % args.ndims:
        print(f"error: {data.size} elements not divisible by "
              f"--ndims {args.ndims}", file=sys.stderr)
        return 2
    codec = SprintzCodec(args.codec, elem_sz, entropy=args.entropy)
    stream = codec.compress(data, ndims=args.ndims)
    out = stream if args.raw else (
        MAGIC + _pack_flags(args.codec, elem_sz, args.entropy) + stream)
    with open(args.outfile, "wb") as f:
        f.write(out)
    print(f"{data.nbytes} -> {len(out)} bytes "
          f"(ratio {data.nbytes / max(len(out), 1):.3f}x)", file=sys.stderr)
    return 0


def _cmd_decompress(args) -> int:
    from .api import SprintzCodec

    with open(args.infile, "rb") as f:
        buf = f.read()
    stream, codec_name, elem_sz, entropy = _read_container(buf, args)
    codec = SprintzCodec(codec_name, elem_sz, entropy=entropy)
    out = codec.decompress(stream)
    np.asarray(out).tofile(args.outfile)
    print(f"{len(buf)} -> {np.asarray(out).nbytes} bytes", file=sys.stderr)
    return 0


def _cmd_info(args) -> int:
    from .golden.stream import read_metadata_rle
    from .validate import validate_stream

    with open(args.infile, "rb") as f:
        buf = f.read()
    stream, codec_name, elem_sz, entropy = _read_container(buf, args)
    if entropy == "huffman":
        from .entropy import huff_decompress

        stream = huff_decompress(stream).tobytes()
    ngroups, remaining, ndims = read_metadata_rle(stream)
    rep = validate_stream(stream, elem_sz=elem_sz)
    print(f"codec:     {codec_name}")
    print(f"dtype:     uint{8 * elem_sz}")
    print(f"entropy:   {entropy}")
    print(f"ndims:     {ndims}")
    print(f"ngroups:   {ngroups}")
    print(f"remaining: {remaining} elements (verbatim tail)")
    tail_rows = remaining // max(ndims, 1) if ndims else remaining
    print(f"rows:      {rep.total_rows + tail_rows} "
          f"({rep.data_blocks} data blocks, {rep.run_blocks} run blocks)")
    print(f"bytes:     {len(buf)}")
    print(f"valid:     {rep.ok}"
          + ("" if rep.ok else f" ({'; '.join(rep.errors)})"))
    return 0 if rep.ok else 1


def _cmd_query(args) -> int:
    from .query import Operation, QueryParams, query

    with open(args.infile, "rb") as f:
        buf = f.read()
    stream, codec_name, elem_sz, entropy = _read_container(buf, args)
    if entropy == "huffman":
        from .entropy import huff_decompress

        stream = huff_decompress(stream).tobytes()
    op = {"sum": Operation.REDUCE_SUM, "max": Operation.REDUCE_MAX,
          "min": Operation.REDUCE_MIN}[args.op]
    res = query(stream, QueryParams(op=op, materialize=False),
                codec=codec_name, elem_sz=elem_sz)
    val = getattr(res, args.op)
    print(np.asarray(val).tolist())
    return 0


def _common_stream_flags(p):
    p.add_argument("--codec", choices=_CODECS, default="delta",
                   help="forecaster (raw streams only; containers carry it)")
    p.add_argument("--dtype", choices=sorted(_DTYPES), default="u8",
                   help="element type (raw streams only)")
    p.add_argument("--entropy", choices=_ENTROPY, default="none",
                   help="entropy stage (raw streams only)")
    p.add_argument("--raw", action="store_true",
                   help="treat the file as a bare reference-exact stream "
                        "(no SPZT1 container)")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="sprintz-tpu",
        description="Sprintz-TPU lossless time-series compression")
    sub = ap.add_subparsers(dest="cmd", required=True)
    dev = argparse.ArgumentParser(add_help=False)
    dev.add_argument("--device", choices=["cpu", "auto"], default="cpu",
                     help="JAX platform: 'cpu' (default — a shell tool must "
                          "not pay accelerator-relay dispatch latency) or "
                          "'auto' (the process default, e.g. the TPU)")

    p = sub.add_parser("compress", help="compress a raw binary file",
                       parents=[dev])
    p.add_argument("infile")
    p.add_argument("outfile")
    p.add_argument("--ndims", type=int, default=1,
                   help="columns per row (row-major interleave)")
    p.add_argument("--codec", choices=_CODECS, default="delta")
    p.add_argument("--dtype", choices=sorted(_DTYPES), default="u8")
    p.add_argument("--entropy", choices=_ENTROPY, default="none")
    p.add_argument("--raw", action="store_true",
                   help="emit the bare reference-exact stream (no container)")
    p.set_defaults(fn=_cmd_compress)

    p = sub.add_parser("decompress", help="decompress to a raw binary file",
                       parents=[dev])
    p.add_argument("infile")
    p.add_argument("outfile")
    _common_stream_flags(p)
    p.set_defaults(fn=_cmd_decompress)

    p = sub.add_parser("info", help="print stream metadata + validation",
                       parents=[dev])
    p.add_argument("infile")
    _common_stream_flags(p)
    p.set_defaults(fn=_cmd_info)

    p = sub.add_parser("query", help="pushdown reduce without materializing",
                       parents=[dev])
    p.add_argument("infile")
    p.add_argument("--op", choices=["sum", "max", "min"], default="sum")
    _common_stream_flags(p)
    p.set_defaults(fn=_cmd_query)

    args = ap.parse_args(argv)
    if args.device == "cpu":
        # must happen in-process before first device use: the JAX_PLATFORMS
        # env var is pinned by this environment's sitecustomize (CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", "cpu")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
