"""Scalar (numpy) forecaster state machines for the golden codec.

These are the executable spec of the per-column predictors:

- Delta: running previous value per dim (sprintz_delta_rle.cpp:161-184).
- FIRE ("xff"): online-learned one-tap filter over previous deltas with
  sign-gradient descent on L1 loss (sprintz_xff_rle.cpp:199-276,
  communicate/method.tex:143-271).

Each predictor exposes:
- ``encode_block(block) -> errs``: consume an (8, ndims) block of raw values,
  update state, return the zigzag-encoded prediction errors.
- ``decode_block(errs) -> block``: inverse.
- ``decode_run(nblocks) -> values``: materialize ``nblocks`` blocks of
  zero-error rows and advance state identically to the encoder.

Bit-exact integer semantics (wraparound, arithmetic shifts, narrowing
truncation) are enforced via explicit numpy dtypes.
"""

from __future__ import annotations

import numpy as np

from ..constants import (
    BLOCK_SZ,
    FIRE_LEARNING_DOWNSAMPLE,
    FIRE_LEARNING_SHIFT,
    LOG2_BLOCK_SZ,
    FIRE_LOG2_LEARNING_DOWNSAMPLE,
    counter_dtype,
    int_dtype,
    uint_dtype,
)
from ..utils.bits import icopysign, zigzag_decode, zigzag_encode


class DeltaPredictor:
    """Per-dim delta coding: err = val - prev_val."""

    def __init__(self, ndims: int, elem_sz: int, block_sz: int = BLOCK_SZ):
        self.ndims = ndims
        self.udt = uint_dtype(elem_sz)
        self.idt = int_dtype(elem_sz)
        self.block_sz = block_sz
        self.prev_vals = np.zeros(ndims, dtype=self.udt)

    def encode_block(self, block: np.ndarray) -> np.ndarray:
        prev_rows = np.vstack([self.prev_vals[None, :], block[:-1]])
        deltas = (block - prev_rows).view(self.idt)  # uint wraparound
        self.prev_vals = block[-1].copy()
        return zigzag_encode(deltas)

    def decode_block(self, errs: np.ndarray) -> np.ndarray:
        deltas = zigzag_decode(errs).view(self.udt)
        vals = (self.prev_vals[None, :] + np.cumsum(deltas.astype(np.uint64), axis=0)
                ).astype(self.udt)
        self.prev_vals = vals[-1].copy()
        return vals

    def decode_run(self, nblocks: int) -> np.ndarray:
        # Zero deltas: every row repeats the previous row.
        return np.tile(self.prev_vals, (nblocks * self.block_sz, 1))


class FirePredictor:
    """FIRE: prediction = prev_delta * coef (fixed point), online coef update.

    Per block (sprintz_xff_rle.cpp:199-276):
      coef    = (counter >> (learning_shift + shft)) << shft   # top-4-bit trunc
      per row: delta = val - prev_val
               prediction = (prev_delta * coef) >> elem_bits
               err = delta - prediction
               every 2nd row: grad_sum += icopysign(err, prev_delta)
      counter += grad_sum >> (log2_block_sz - log2_learning_downsample)
    """

    def __init__(self, ndims: int, elem_sz: int, truncate_coeffs: bool = True):
        self.ndims = ndims
        self.elem_sz = elem_sz
        self.elem_bits = 8 * elem_sz
        # The rowmajor variant truncates the coefficient to its top 4 bits
        # and to i16 (sprintz_xff_rle.cpp:209-221); the lowdim variant keeps
        # full precision in the counter type (sprintz_xff_lowdim.cpp:38-39,
        # 170-173: truncate_coeffs == false).
        self.truncate_coeffs = truncate_coeffs
        self.shft = self.elem_bits - 4 if truncate_coeffs else 0
        self.udt = uint_dtype(elem_sz)
        self.idt = int_dtype(elem_sz)
        self.cdt = counter_dtype(elem_sz)
        # Wide type used for the (promoted) fixed-point multiply.
        self.wide = np.int32
        self.prev_vals = np.zeros(ndims, dtype=self.udt)
        self.prev_deltas = np.zeros(ndims, dtype=self.idt)
        self.counters = np.zeros(ndims, dtype=self.cdt)

    def _coef(self) -> np.ndarray:
        shifted = self.counters.astype(np.int32) >> (FIRE_LEARNING_SHIFT + self.shft)
        coef = shifted << self.shft
        return coef.astype(np.int16) if self.truncate_coeffs else coef.astype(self.cdt)

    def _step_rows(self, nrows: int, get_err):
        """Run ``nrows`` predict/update steps; get_err(i, prediction) -> err."""
        coef = self._coef().astype(self.wide)
        grad_sum = np.zeros(self.ndims, dtype=self.idt)
        out_vals = np.empty((nrows, self.ndims), dtype=self.udt)
        out_errs = np.empty((nrows, self.ndims), dtype=self.idt)
        for i in range(nrows):
            prediction = (
                (self.prev_deltas.astype(self.wide) * coef) >> self.elem_bits
            ).astype(self.idt)
            err = get_err(i, prediction)
            delta = (err + prediction).astype(self.idt)
            val = (self.prev_vals + delta.view(self.udt)).astype(self.udt)
            if i % FIRE_LEARNING_DOWNSAMPLE == FIRE_LEARNING_DOWNSAMPLE - 1:
                # sign taken from err, magnitude from prev_delta
                # (sprintz_xff_rle.cpp:241-243)
                grad_sum = (grad_sum + icopysign(err, self.prev_deltas)).astype(
                    self.idt)
            out_vals[i] = val
            out_errs[i] = err
            self.prev_vals = val
            self.prev_deltas = delta
            if (i + 1) % BLOCK_SZ == 0:
                shift = LOG2_BLOCK_SZ - FIRE_LOG2_LEARNING_DOWNSAMPLE
                self.counters = (
                    self.counters
                    + (grad_sum.astype(self.cdt) >> shift)
                ).astype(self.cdt)
                grad_sum = np.zeros(self.ndims, dtype=self.idt)
                coef = self._coef().astype(self.wide)
        return out_vals, out_errs

    def encode_block(self, block: np.ndarray) -> np.ndarray:
        block = np.ascontiguousarray(block, dtype=self.udt)

        def get_err(i, prediction):
            delta = (block[i] - self.prev_vals).view(self.idt)
            return (delta - prediction).astype(self.idt)

        _, errs = self._step_rows(BLOCK_SZ, get_err)
        return zigzag_encode(errs)

    def decode_block(self, errs_zz: np.ndarray) -> np.ndarray:
        errs = zigzag_decode(errs_zz)

        def get_err(i, prediction):
            return errs[i]

        vals, _ = self._step_rows(BLOCK_SZ, get_err)
        return vals

    def decode_run(self, nblocks: int) -> np.ndarray:
        zero = np.zeros(self.ndims, dtype=self.idt)

        def get_err(i, prediction):
            return zero

        vals, _ = self._step_rows(nblocks * BLOCK_SZ, get_err)
        return vals
