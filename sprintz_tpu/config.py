"""Central registry for every ``SPRINTZ_*`` knob (VERDICT r3 item 9).

One declarative table: name, type, default, choices, WHEN the value is
read, and the A/B evidence (STATUS.md session) that set the default.
``docs/CONFIG.md`` is generated from this table (``python -m
sprintz_tpu.config``) so the docs cannot drift from the code.

Read-time semantics (the column that bites):

- ``import``: parsed once when ``sprintz_tpu.config`` is imported. The
  owning module mirrors the value into a module global (kept so tests
  can monkeypatch e.g. ``ops.pack.MXU_IMPL`` per-case); setting the env
  var later in the same process has no effect.
- ``trace``: like ``import``, but the value is baked into jitted
  programs at first trace — after changing the module global you must
  also ``jax.clear_caches()`` or the old behavior persists in cache.
- ``call``: read from ``os.environ`` fresh on every use (safe to set
  mid-process; what ``monkeypatch.setenv`` tests rely on).

Validation: at import, any environment variable starting with
``SPRINTZ_`` that is not declared here raises ``UnknownKnobWarning``
(a typo'd knob silently doing nothing is the failure mode this
registry exists to prevent), and declared values are checked against
``choices``/type with a hard ``ValueError``.

The reference has no equivalent (its knobs are compile-time #defines
scattered through cpp/Compress); SURVEY §5 prescribed a real config
object for the rebuild.
"""

from __future__ import annotations

import dataclasses
import os
import warnings


class UnknownKnobWarning(UserWarning):
    """An SPRINTZ_* env var is set but not declared in the registry."""


@dataclasses.dataclass(frozen=True)
class Knob:
    name: str  # full env var name, SPRINTZ_*
    default: object
    kind: str  # "import" | "trace" | "call"
    type: str  # "str" | "int" | "flag" (flag: "1" = on)
    help: str
    owner: str  # module that consumes it (module global of same suffix)
    choices: tuple | None = None
    evidence: str = ""  # STATUS.md session / VERDICT item that set it


_K = Knob
KNOBS: dict[str, Knob] = {k.name: k for k in [
    # ---------------------------------------------------------- ops/pack
    _K("SPRINTZ_MXU_IMPL", "bf16", "trace", "str",
       "Number format for the batched unpack/pack one-hot matmuls: bf16 "
       "(exact for <=16-bit fields via 3-byte windows), s8 (biased "
       "int8 dot), or bf3 (shifted-payload: ONE byte-select one-hot — "
       "single compare instead of the 3-level where chain — with "
       "byte-shifted payload copies on the dot's M axis).",
       "ops.pack.MXU_IMPL", ("bf16", "s8", "bf3"),
       "session 2: s8 LOSES 2.4x; session 52: bf3 A/B"),
    _K("SPRINTZ_UNPACK_NWIN", "auto", "trace", "str",
       "Byte-window count for the rowmajor (un)pack matmuls: auto (2 "
       "windows for u8 streams — fields stop at (off&7)+width <= 15 "
       "bits, so the 65536 window is provably zero — 3 for u16), 3 "
       "forces the conservative pre-session-52 behavior for A/B, 2 is "
       "accepted but still clamps u16 call sites to 3 (2 windows can "
       "never be valid there).", "ops.pack.UNPACK_NWIN",
       ("auto", "2", "3"),
       "session 52: 2-window u8 unpack +8% (23.0 -> 24.9 headline)"),
    _K("SPRINTZ_USE_PALLAS", "0", "trace", "str",
       "Route the rowmajor unpack through the Pallas kernels (0=XLA "
       "one-hot matmul, 1=i32 kernel, mxu/mxu16=MXU kernel variants). "
       "Kept as A/B evidence: every Pallas variant measured SLOWER than "
       "the XLA formulation on this stack.", "ops.pack._USE_PALLAS",
       ("0", "1", "mxu", "mxu16"),
       "round-2 bring-up: fused Pallas pipeline 3.6 vs XLA 14.4 GB/s"),
    _K("SPRINTZ_UNPACK_PAIR", "0", "trace", "flag",
       "Paired-dim u8 unpack/pack (one 3-byte matmul window per dim "
       "PAIR, halving the weight tensor). Exact but measured 2.4x "
       "SLOWER (bf16 lane tiles are 128 wide; pairing shrinks the "
       "minor dim to 32 = 4x pad).", "ops.pack.UNPACK_PAIR", None,
       "sessions 34/35: decode loses 2.4x, encode a wash"),
    _K("SPRINTZ_UNPACK_WLAYOUT", "auto", "trace", "str",
       "Rowmajor unpack formulation: auto (wordsel when maxb==8 — its "
       "2-deep word select wins 1.2-1.5x; one-hot matmul otherwise), "
       "transpose (matmul always), dot (weight built in dot-operand "
       "layout), wordsel (matmul-free select+funnel; 28x LOSS at "
       "maxb 32 — deep select chains scalarize).",
       "ops.pack.UNPACK_WLAYOUT", ("auto", "transpose", "dot", "wordsel"),
       "sessions 46/47: d8u8 2.1->3.2, d16u8 4.4->6.3, d16u16 7.9->9.5"),
    _K("SPRINTZ_LOWDIM_IMPL", "auto", "trace", "str",
       "Lowdim (un)pack formulation: auto (unpack: jsel for u8 D<=4 "
       "legacy-shape calls, einsum otherwise; pack: einsum), einsum "
       "(per-block one-hot MXU dot), einsum2 (EB-major weights; DIES "
       "UNAVAILABLE at some grouped shapes on device — session 39), "
       "select (VPU select-acc), wselect (width-stratified static "
       "shifts), dyn (variable shifts; 10x loser, session 13), wbank "
       "(static width-bank MXU weight + per-width select), jsel "
       "(fused EB-way static selects), wsel32 (word-granular 2-deep "
       "select + funnel — session 48 A/B).",
       "ops.pack.LOWDIM_IMPL",
       ("auto", "einsum", "einsum2", "select", "wselect", "dyn",
        "wbank", "jsel", "wsel32"),
       "sessions 5/9/13/39: d3 u8 decode 1.70->1.84 via auto-jsel"),
    # ----------------------------------------------------------- decoder
    _K("SPRINTZ_LOWDIM_PASS", "auto", "trace", "str",
       "Fused lowdim delta decode pass: auto (grouped when 128%D==0, "
       "else legacy), grouped (force the flat-scatter grouped runs "
       "path too), dmajor, legacy.", "decoder.LOWDIM_PASS",
       ("auto", "grouped", "dmajor", "legacy"),
       "sessions 12/13: grouped wins decode 1.2-1.4x"),
    _K("SPRINTZ_GROUPED_FINISH", "v1", "trace", "str",
       "Grouped lowdim prefix finish: v1 (offset add in (c,8,g,D) "
       "minor-D layout) or v2 (full-lane (c,8,g*D) add; g-axis offset "
       "prefix = log2(g) static lane shifts).",
       "decoder.GROUPED_FINISH", ("v1", "v2"), "session 38 A/B"),
    _K("SPRINTZ_LOWDIM_D3", "fold4", "trace", "str",
       "d3 grouped decode fold: fold4 (zero-width 4th dim, d4 pass) "
       "or native (g=42 fold, 126/128 lanes, no fake dim; decode "
       "only — encode always folds as d4).",
       "decoder/ops.pack.LOWDIM_D3", ("fold4", "native"),
       "session 38 A/B"),
    _K("SPRINTZ_LOWDIM_DMAJOR", "1", "trace", "flag",
       "Dim-major lowdim passes available (encoder pass choice and "
       "decoder dmajor path).", "decoder/encoder.LOWDIM_DMAJOR", None,
       "session 9: 1.9x over legacy for encode"),
    _K("SPRINTZ_LOWDIM_DMAJOR_IMPL", "dyn", "trace", "str",
       "Dim-major pack/unpack formulation: dyn (dynamic shifts) or "
       "strata (width-stratified static shifts; lost on op-count, "
       "session 9).", "decoder/encoder.LOWDIM_DMAJOR_IMPL",
       ("dyn", "strata"), "session 11"),
    _K("SPRINTZ_RUNS_TIMELINE", "auto", "trace", "str",
       "Runs-stream timeline realization: auto (= gather everywhere "
       "since fine buckets removed dgather's session-31 edge, session "
       "38), gather (block-gather of unpacked errs), dgather (gather "
       "PACKED bytes, unpack on the timeline), ngather (gather errs "
       "NARROWED to elem width), scatter (legacy row scatter).",
       "decoder.RUNS_TIMELINE",
       ("auto", "gather", "dgather", "ngather", "scatter"),
       "session 38: gather 18.1 vs dgather 15.8 at 1/3-runs u8"),
    _K("SPRINTZ_ROWMAJOR_FOLD", "0", "trace", "flag",
       "Block-folded rowmajor delta decode (G=128/D blocks -> full-lane "
       "tensors). Exact; a wash at D=64 (g=2) and LOSES 25%% at D=32 "
       "(g=4: the g-times-wider one-hot window outgrows the lane-pad "
       "savings) — opt-in A/B evidence only.",
       "decoder.ROWMAJOR_FOLD", None, "sessions 36/57"),
    _K("SPRINTZ_DECODE_FLAT", "auto", "trace", "str",
       "Flat-param contiguous decode: pass the dense/widths jit params "
       "as 1-D arrays (their (nb,8,maxb)/(nb,D) layouts pad minor dims "
       "at rest). auto = every contiguous pass, all, 0. Sessions "
       "42/43: d64 u8 17.7->21.7, u16 42->49, lowdim d4u8 1.86->3.92, "
       "d2u16 2.92->7.10, d3u8 1.84->2.36 GB/s.",
       "decoder.DECODE_FLAT", ("auto", "all", "0"), "sessions 42/43"),
    _K("SPRINTZ_MAXB_BUCKET", "pow2", "trace", "str",
       "Bucketing of the dense unpack buffer's byte width: pow2 (fewer "
       "jit variants) or mult8 (up to 1.6x smaller weights).",
       "decoder.MAXB_BUCKET", ("pow2", "mult8"), "session 21"),
    _K("SPRINTZ_RAGGED_DECODE", "", "call", "flag",
       "Ragged-dot unpack over signature-sorted blocks instead of the "
       "per-signature grouped pass. Measured slower; kept as A/B "
       "evidence.", "decoder._use_ragged()", None,
       "session 24: loses to grouped"),
    _K("SPRINTZ_GROUPED_DECODE", "", "call", "flag",
       "Route runs-containing rowmajor streams through the grouped "
       "width-signature pass. Measured slower than the gather "
       "timeline; kept as A/B evidence.", "decoder.decompress", None,
       "session 14"),
    # ----------------------------------------------------------- encoder
    _K("SPRINTZ_ENCODE_FLAT", "auto", "trace", "str",
       "Flat-param lowdim delta encode: auto (u8 D in {2,3,4} + u16 "
       "d2 — the (N,D) param layout was the encode floor; d3 "
       "0.49->1.23, d4 1.68->2.37, u16 d2 2.22->2.37 GB/s; u16 d1 "
       "keeps dmajor, flat LOSES 12.9->10.7), all, 0 (off). "
       "Precedence: auto defers to an explicitly set "
       "SPRINTZ_LOWDIM_ENCODE (so pass A/Bs measure the requested "
       "pass); 'all' overrides it.",
       "encoder.ENCODE_FLAT", ("auto", "all", "0"),
       "sessions 40/41/43"),
    _K("SPRINTZ_LOWDIM_ENCODE", None, "trace", "str",
       "Lowdim delta encode pass: dmajor (default when "
       "SPRINTZ_LOWDIM_DMAJOR=1), grouped, legacy. Setting this "
       "explicitly also disables the SPRINTZ_ENCODE_FLAT auto-route "
       "(flat still wins with ENCODE_FLAT=all).",
       "encoder.LOWDIM_ENCODE", ("dmajor", "grouped", "legacy"),
       "sessions 9/11: dmajor 1.9x"),
    # ------------------------------------------------- models/forecasters
    _K("SPRINTZ_PREFIX_IMPL", "s8", "trace", "str",
       "Number format for the triangular prefix-sum matmul: s8 wins "
       "1.5x for the two-plane u16 prefix, ties at u8.",
       "models.forecasters.PREFIX_IMPL", ("s8", "bf16"),
       "session 2"),
    _K("SPRINTZ_PREFIX_FOLD", "auto", "trace", "str",
       "Hierarchical cumsum chunk folding.",
       "models.forecasters.PREFIX_FOLD", ("auto", "0", "1"),
       "session 2: chunk 256 beats 512"),
    _K("SPRINTZ_SCAN_UNROLL", "0", "trace", "int",
       "FIRE serial-scan unroll (0 = per-backend auto: TPU 32, CPU 8 — "
       "unroll 32 on XLA:CPU sends LLVM into a >15-min compile).",
       "models.forecasters.SCAN_UNROLL", None,
       "sessions 3/4: +37% at 32 on TPU; 64/128 gain <=9%"),
    # ------------------------------------------------------------ entropy
    _K("SPRINTZ_HUFF_CHUNK", None, "import+call", "int",
       "Huffman chunk_symbols override. Unset = size-aware auto "
       "(cs=128 at device scale — the Pallas kernel's sweet spot; "
       "cs=4096 for host-decoded small streams, recovering ~2% ratio). "
       "Must fit u16.", "entropy.huffman.DEFAULT_CHUNK_SYMBOLS", None,
       "sessions 26/29 + VERDICT r3 item 2"),
    _K("SPRINTZ_HUFF_DEVICE", "auto", "call", "str",
       "Device Huffman decode kernel: auto (Pallas when available on "
       "an accelerator), pallas, xla.", "entropy.huffman._decode_jax",
       ("auto", "pallas", "xla"), "session 26: Pallas 13.9 vs XLA 2.9"),
    _K("SPRINTZ_HUFF_FUSE_PERM", "1", "trace", "flag",
       "Run the canonical-index -> symbol permutation inside the Pallas "
       "Huffman decode kernel (tail becomes a pure transpose + byte "
       "split) instead of as an XLA lookup pass.",
       "entropy.pallas_huffman.FUSE_PERM", None,
       "session 38: fused 14.3 vs split 12.6 GB/s e2e at cs=128"),
    _K("SPRINTZ_HUFF_DEVICE_MIN", str(1 << 22), "import", "int",
       "Minimum stream bytes before huff_decompress 'auto' routes to "
       "the device kernel (each dispatch through the axon relay costs "
       "~60 ms; set 0 on direct-attached TPUs).",
       "entropy.huffman.HUFF_DEVICE_MIN_BYTES", None, "ADVICE r3"),
    # ------------------------------------------------------------- native
    _K("SPRINTZ_NO_NATIVE", "", "call", "flag",
       "Force the pure-Python fallbacks for every native C++ host stage "
       "(plan walk, assembly, Huffman loops).", "native_host", None, ""),
    _K("SPRINTZ_NATIVE_CACHE", None, "call", "str",
       "Directory for the compiled native library (default "
       "~/.cache/sprintz_tpu).", "native_host", None, ""),
    # --------------------------------------------------------------- data
    _K("SPRINTZ_DATA_DIR", None, "call", "str",
       "Root directory of the benchmark corpora (UCR/AMPDS/PAMAP/...); "
       "unset = the checked-in mini corpus.", "data.corpus/loaders",
       None, ""),
    # -------------------------------------------------------- bench/tests
    _K("SPRINTZ_BENCH_EXTRAS", "1", "call", "flag",
       "bench.py: run the per-config context measurements.", "bench.py",
       None, ""),
    _K("SPRINTZ_BENCH_HUFF_CHUNK", "128", "call", "int",
       "bench.py: chunk_symbols for the Huffman kernel rows.",
       "bench.py", None, ""),
    _K("SPRINTZ_BENCH_FIRE", "", "call", "flag",
       "bench.py: add the raw FIRE-lanes context row.", "bench.py",
       None, ""),
    _K("SPRINTZ_BENCH_RETRIES", "2", "call", "int",
       "bench.py: re-exec attempts when the relay refuses the device "
       "claim.", "bench.py", None, ""),
    _K("SPRINTZ_BENCH_XFFBATCH", "", "call", "flag",
       "bench.py: add the batched multi-stream xff encode row "
       "(compress_batch operating point).", "bench.py", None,
       "VERDICT r3 item 10"),
    _K("SPRINTZ_REF_LIB", "/tmp/refbuild/libsprintz_ref.so", "call",
       "str", "Path of the compiled reference oracle library "
       "(tests/oracle.py).", "tests.oracle", None, ""),
    _K("SPRINTZ_FUZZ_SEED", None, "import", "int",
       "Differential fuzz seed (default: fresh entropy per run).",
       "tests.test_differential", None, ""),
    _K("SPRINTZ_FUZZ_CASES", "6", "import", "int",
       "Differential fuzz cases per config.", "tests.test_differential",
       None, ""),
    _K("SPRINTZ_SESSION_SMOKE", "", "call", "flag",
       "tools/tpu_session*: run the session script on CPU with tiny "
       "shapes (CI smoke).", "tools.tpu_session*", None, ""),
    _K("SPRINTZ_SESSION_SEC", None, "call", "str",
       "tools/tpu_session37+: comma list of sections to run.",
       "tools.tpu_session37", None, ""),
    _K("SPRINTZ_PROFILE_CPU", "", "call", "flag",
       "tools/profile_*: profile on CPU instead of the device.",
       "tools.profile_encode", None, ""),
    _K("SPRINTZ_RISKY", "", "call", "flag",
       "tools: enable kernel variants that may fault (and wedge) the "
       "TPU.", "tools.profile_pallas2", None, ""),
    _K("SPRINTZ_DEMO_TPU", "", "call", "flag",
       "examples/demo.py: run on the real device instead of CPU.",
       "examples.demo", None, ""),
]}


def _parse(k: Knob, raw: str):
    if k.type == "int":
        try:
            return int(raw)
        except ValueError:
            raise ValueError(
                f"{k.name}={raw!r}: expected an integer") from None
    if k.choices is not None and raw not in k.choices:
        raise ValueError(
            f"{k.name}={raw!r}: expected one of {list(k.choices)}")
    return raw


def validate_environ(environ=None) -> None:
    """Warn on undeclared SPRINTZ_* vars; raise on invalid values."""
    environ = os.environ if environ is None else environ
    for name, raw in environ.items():
        if not name.startswith("SPRINTZ_"):
            continue
        k = KNOBS.get(name)
        if k is None:
            warnings.warn(
                f"unknown knob {name} is set (not in "
                "sprintz_tpu.config.KNOBS — typo?)", UnknownKnobWarning,
                stacklevel=2)
        else:
            _parse(k, raw)


def get(name: str, default=None):
    """Fresh (call-time) read of a declared knob, parsed and validated."""
    k = KNOBS[name]
    raw = os.environ.get(name)
    if raw is None:
        if default is not None:
            return default
        if isinstance(k.default, str) and k.type == "int":
            return int(k.default)
        return k.default
    return _parse(k, raw)


def flag(name: str) -> bool:
    """Fresh read of a flag knob ('1' = on)."""
    KNOBS[name]  # declared?
    return os.environ.get(name) == "1"


def markdown() -> str:
    """The docs/CONFIG.md body (generated; see this module's docstring)."""
    lines = [
        "# Configuration knobs",
        "",
        "Every `SPRINTZ_*` environment variable, generated from",
        "`sprintz_tpu/config.py` (`python -m sprintz_tpu.config >",
        "docs/CONFIG.md`). Undeclared `SPRINTZ_*` vars raise",
        "`UnknownKnobWarning` at import; invalid values raise",
        "`ValueError`.",
        "",
        "**Read column**: `import` = parsed once at package import;",
        "`trace` = additionally baked into jitted programs at first",
        "trace (change the module global AND `jax.clear_caches()`);",
        "`call` = read fresh on every use.",
        "",
        "| Knob | Default | Read | Values | Owner | What / evidence |",
        "|---|---|---|---|---|---|",
    ]
    for k in KNOBS.values():
        choices = "/".join(k.choices) if k.choices else (
            "0/1" if k.type == "flag" else k.type)
        ev = f" *({k.evidence})*" if k.evidence else ""
        default = "unset" if k.default in (None, "") else str(k.default)
        lines.append(
            f"| `{k.name}` | `{default}` | {k.kind} | {choices} "
            f"| `{k.owner}` | {k.help}{ev} |")
    lines.append("")
    return "\n".join(lines)


validate_environ()

if __name__ == "__main__":
    print(markdown())
