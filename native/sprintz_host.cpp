// Native host-side runtime for sprintz_tpu: emission planner and header
// walk. These are the only intrinsically sequential, per-block host loops
// in the framework (stream-order bookkeeping); the data path runs on TPU.
//
// Semantics mirror sprintz_tpu/planner.py:build_plan and
// sprintz_tpu/decoder.py:walk_headers exactly (shared test suite), which
// in turn replicate the reference encoder's consumption order
// (sprintz_delta_rle.cpp:214-312).

#include <cstdint>
#include <cstring>

namespace {

constexpr int kBlockSz = 8;
constexpr int kGroupSzBlocks = 2;
constexpr int kMaxRunNblocks = 0x7fff;

constexpr int8_t kKindData = 0;
constexpr int8_t kKindRun = 1;
constexpr int8_t kKindRun0 = 2;

}  // namespace

extern "C" {

// Derive the slot event sequence from per-block zero flags.
// kinds_out/values_out must hold >= 2 * nb_max + kGroupSzBlocks entries.
// out_meta: [nslots, ngroups, consumed_blocks, remaining_elems]
int64_t sprintz_build_plan(
    const uint8_t* zero_flags, int64_t n_elems, int32_t ndims,
    int32_t run_cmp_allows_equal,
    int8_t* kinds_out, int32_t* values_out, int64_t* out_meta) {
  const int64_t block_elems = (int64_t)kBlockSz * ndims;
  const int64_t group_sz = block_elems * kGroupSzBlocks;
  const int64_t last_start = n_elems - group_sz;

  int64_t nslots = 0;
  int64_t i = 0;
  int32_t run = 0;
  bool finished = false;

  while (i <= last_start && !finished) {
    int b = 0;
    while (b < kGroupSzBlocks) {
      const int64_t bidx = i / block_elems;
      const bool z = zero_flags[bidx] != 0;
      for (;;) {  // just_read_block
        if (z && run < kMaxRunNblocks) {
          run++;
          i += block_elems;
          const bool more =
              run_cmp_allows_equal ? (i <= last_start) : (i < last_start);
          if (more) break;  // read next block, same group position
          kinds_out[nslots] = kKindRun;
          values_out[nslots++] = run;
          run = 0;
          b++;
          while (b < kGroupSzBlocks) {
            kinds_out[nslots] = kKindRun0;
            values_out[nslots++] = 0;
            b++;
          }
          finished = true;
          break;
        }
        if (run > 0) {
          kinds_out[nslots] = kKindRun;
          values_out[nslots++] = run;
          run = 0;
          b++;
          if (b == kGroupSzBlocks) {
            b = 0;
            continue;  // same block becomes next group's first slot
          }
          if (z) continue;  // run cap hit on a zero block
        }
        kinds_out[nslots] = kKindData;
        values_out[nslots++] = (int32_t)bidx;
        i += block_elems;
        b++;
        break;
      }
      if (finished) break;
    }
  }

  out_meta[0] = nslots;
  out_meta[1] = nslots / kGroupSzBlocks;
  out_meta[2] = i / block_elems;
  out_meta[3] = n_elems - i;
  return nslots;
}

// Walk group headers to index payloads and runs.
// widths_out: ndata_max * ndims; offsets_out/out_rows_out: ndata_max.
// out_meta: [ndata, total_rows, tail_offset]
int64_t sprintz_walk_headers(
    const uint8_t* buf, int64_t start, int64_t ngroups, int32_t ndims,
    int32_t elem_sz, int32_t lowdim,
    int32_t* widths_out, int64_t* offsets_out, int64_t* out_rows_out,
    int64_t* out_meta) {
  const int hdr_bits = elem_sz == 1 ? 3 : 4;
  const int elem_bits = 8 * elem_sz;
  const int64_t total_header_bits =
      (int64_t)ndims * hdr_bits * kGroupSzBlocks;
  const int64_t total_header_bytes = (total_header_bits + 7) / 8;

  int64_t pos = start;
  int64_t row = 0;
  int64_t ndata = 0;

  for (int64_t g = 0; g < ngroups; g++) {
    const uint8_t* hdr = buf + pos;
    pos += total_header_bytes;
    int64_t bitpos = 0;
    for (int b = 0; b < kGroupSzBlocks; b++) {
      int64_t wsum = 0;
      int32_t* wrow = widths_out + ndata * ndims;
      for (int d = 0; d < ndims; d++) {
        const int64_t bp = bitpos + (int64_t)d * hdr_bits;
        // fields never span more than 2 bytes (3/4-bit fields)
        const uint32_t two =
            (uint32_t)hdr[bp >> 3] | ((uint32_t)hdr[(bp >> 3) + 1] << 8);
        int32_t h = (two >> (bp & 7)) & ((1u << hdr_bits) - 1);
        if (h == elem_bits - 1) h = elem_bits;
        wrow[d] = h;
        wsum += h;
      }
      bitpos += (int64_t)ndims * hdr_bits;
      if (wsum == 0) {
        const uint8_t low = buf[pos++];
        int32_t length = low & 0x7f;
        if (low & 0x80) length |= (int32_t)buf[pos++] << 7;
        row += (int64_t)length * kBlockSz;
        continue;
      }
      offsets_out[ndata] = pos;
      out_rows_out[ndata] = row;
      ndata++;
      if (lowdim) {
        pos += wsum;  // 8 * w bits == w bytes per dim
      } else {
        pos += (int64_t)kBlockSz * ((wsum + 7) / 8);
      }
      row += kBlockSz;
    }
  }

  out_meta[0] = ndata;
  out_meta[1] = row;
  out_meta[2] = pos;
  return ndata;
}

}  // extern "C"
