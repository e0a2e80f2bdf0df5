"""The flagship "model": a batched device alignment engine.

`DeviceAlignEngine` implements the `AlignEngine` interface
(`nimble_tpu.core.calls`) with the TPU pipeline:

  host: pad/bucket reads ── device: probe+walk (`ops.engine_xla`) ── host:
  exact f64 gates & metric filters (vectorized numpy) + per-read packaging.

Exactness strategy (parity with `pseudoalign`, `src/align.rs:945-989`):
  * length gate and Shannon-entropy gate are computed on host in f64 with the
    reference's operation order (the device only does the integer walk);
  * normalized-score comparison (score/len >= score_percent) is exact f64 on
    host;
  * reads the device cannot bound (anchor postings > C_MAX, or longer than
    the largest bucket) are re-run through the host oracle walk
    (`core.walk.map_read_with_mismatch`) — identical semantics, so results
    are exact for every read.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from nimble_tpu.config import (
    MIN_ENTROPY_SCORE,
    MIN_READ_LENGTH,
    AlignFilterConfig,
    FilterReason,
)
from nimble_tpu.core.filters import (
    AlignmentScore,
    FilterRec,
    filter_alignment_by_metrics,
    pseudoalign,
)
from nimble_tpu.index.build import KmerIndex
from nimble_tpu.ops.device_index import (
    DeviceIndex,
    build_bucketed_index,
    build_device_index,
)
from nimble_tpu.ops.engine_fast import (
    probe_walk_filter,
    probe_walk_full,
    unpack_compact,
)
from nimble_tpu.ops.engine_xla import probe_and_walk

DEFAULT_BUCKETS = (64, 96, 128, 160, 192, 256, 384, 512, 768, 1024)

# sentinel padding value for sorted eq-class arrays (align_raw)
EQ_PAD = np.int64(2**31 - 1)


def batch_entropy(reads: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized Shannon entropy, f64, reference op order (A,T,C,G sum).

    Matches `shannon_entropy` (`src/utils.rs:96-119`) on decoded strings.
    """
    B, Lmax = reads.shape
    mask = np.arange(Lmax)[None, :] < lens[:, None]
    tot = lens.astype(np.float64)
    tot_safe = np.where(tot == 0, 1.0, tot)
    ent = np.zeros(B, dtype=np.float64)
    for code in (0, 3, 1, 2):  # A, T, C, G — the reference's frequency order
        cnt = ((reads == code) & mask).sum(axis=1)
        f = cnt / tot_safe
        with np.errstate(divide="ignore", invalid="ignore"):
            term = np.where(f > 0.0, f * np.log2(np.where(f > 0.0, f, 1.0)), 0.0)
        ent += term
    return -ent


class DeviceAlignEngine:
    """Batched TPU/XLA alignment engine with host-exact filtering."""

    def __init__(
        self,
        index: KmerIndex,
        config: AlignFilterConfig,
        *,
        c_max: int = 8,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        min_batch: int = 64,
        phase_a_positions: int = 8,
        use_pallas_walk: bool = False,
    ):
        self.index = index
        self.config = config
        self.c_max = int(c_max)
        assert self.c_max <= 16, "compact result packing holds <=16 candidate lanes"
        self.buckets = tuple(sorted(buckets))
        self.min_batch = int(min_batch)
        self.phase_a_positions = int(phase_a_positions)
        self.use_pallas_walk = bool(use_pallas_walk)
        if self.use_pallas_walk:
            # Pallas tiles need 128-aligned read batches
            self.min_batch = max(self.min_batch, 128)
        self.didx: DeviceIndex = build_device_index(index)
        self._s_min_cache: dict = {}
        # bucketized layout for the fast compact path
        self.bidx = build_bucketed_index(index)
        self._dev_fast = {
            "bkey_lo": jnp.asarray(self.bidx.bkey_lo),
            "bkey_hi": jnp.asarray(self.bidx.bkey_hi),
            "bstart": jnp.asarray(self.bidx.bstart),
            "bcount": jnp.asarray(self.bidx.bcount),
            "postings_row": jnp.asarray(self.bidx.postings_row),
            "postings_off": jnp.asarray(self.bidx.postings_off),
            "ref_codes_packed": jnp.asarray(self.bidx.ref_codes_packed),
            "row_starts": jnp.asarray(self.bidx.row_starts),
            "row_lengths": jnp.asarray(self.bidx.row_lengths),
        }
        self._dev = {
            "table_key_lo": jnp.asarray(self.didx.table_key_lo),
            "table_key_hi": jnp.asarray(self.didx.table_key_hi),
            "table_start": jnp.asarray(self.didx.table_start),
            "table_count": jnp.asarray(self.didx.table_count),
            "postings_row": jnp.asarray(self.didx.postings_row),
            "postings_off": jnp.asarray(self.didx.postings_off),
            "ref_codes": jnp.asarray(self.didx.ref_codes),
            "row_starts": jnp.asarray(self.didx.row_starts),
            "row_lengths": jnp.asarray(self.didx.row_lengths),
        }

    # --- AlignEngine interface -------------------------------------------

    def align_batch(
        self, seqs: Sequence[Optional[np.ndarray]]
    ) -> List[Tuple[Optional[AlignmentScore], Optional[FilterRec]]]:
        n = len(seqs)
        results: List[Tuple[Optional[AlignmentScore], Optional[FilterRec]]] = [
            (None, None)
        ] * n

        # Partition: skipped / short / device-eligible / host-only.
        device_idx: List[int] = []
        for i, s in enumerate(seqs):
            if s is None:
                continue
            if len(s) < MIN_READ_LENGTH:
                results[i] = (None, (FilterReason.SHORT_READ, 0.0, 0))
                continue
            if len(s) > self.buckets[-1]:
                results[i] = pseudoalign(s, self.index, self.config, MIN_READ_LENGTH)
                continue
            device_idx.append(i)

        if not device_idx:
            return results

        # Bucket by padded length.
        by_bucket: dict = {}
        for i in device_idx:
            L = len(seqs[i])
            bucket = next(b for b in self.buckets if b >= L)
            by_bucket.setdefault(bucket, []).append(i)

        for bucket, idxs in by_bucket.items():
            self._run_bucket(seqs, idxs, bucket, results)
        return results

    # --- compact interface: ~6 downloaded bytes per read ------------------

    def _s_min_table(self, lmax: int) -> np.ndarray:
        """Exact integer threshold table for the normalized-score gate.

        s_min[L] = min integer s with (s / L) >= score_percent under f64,
        the same expression the reference evaluates per read
        (`src/align.rs:968`, `src/filter/align.rs:17`) — so the device-side
        integer compare `score >= s_min[len]` is bit-equivalent.
        """
        key = (self.config.score_percent, lmax)
        cached = self._s_min_cache.get(key)
        if cached is not None:
            return cached
        p = float(self.config.score_percent)
        table = np.zeros(lmax + 1, dtype=np.int32)
        for L in range(1, lmax + 1):
            s = max(0, min(int(np.ceil(p * L)), L + 1))
            while s > 0 and (s - 1) / L >= p:
                s -= 1
            while s <= L and s / L < p:
                s += 1
            table[L] = s
        table[0] = np.int32(2**31 - 1)
        self._s_min_cache[key] = table
        return table

    def compact_dispatch(self, mat: np.ndarray, lens: np.ndarray):
        """Launch phase-A kernels for a chunk; returns an opaque state.

        jax dispatch is asynchronous, so the device starts immediately and
        the caller can overlap host work (e.g. processing the previous
        chunk) before calling :meth:`compact_collect`.
        """
        n, width = mat.shape
        lens = np.asarray(lens, dtype=np.int32)
        needs_host = lens > self.buckets[-1]
        eligible = (lens >= MIN_READ_LENGTH) & ~needs_host
        launches = []
        if eligible.any():
            bucket_arr = np.asarray(self.buckets)
            bucket_idx = np.searchsorted(bucket_arr, lens)
            for bi in np.unique(bucket_idx[eligible]):
                bucket = int(bucket_arr[bi])
                sel = np.flatnonzero(eligible & (bucket_idx == bi))
                m = len(sel)
                B = max(self.min_batch, 1 << (m - 1).bit_length())
                reads = np.zeros((B, bucket), dtype=np.int8)
                take = min(bucket, width)
                reads[:m, :take] = mat[sel, :take]
                blens = np.zeros(B, dtype=np.int32)
                blens[:m] = lens[sel]
                packed = self._launch_fast_kernel(
                    reads, blens, bucket, self.phase_a_positions
                )
                launches.append((bucket, sel, m, reads, blens, packed))
        return {"n": n, "lens": lens, "needs_host": needs_host,
                "launches": launches}

    def compact_collect(self, state, defer_unresolved: bool = False):
        """Fetch phase-A results, run phase B for unresolved reads, and
        assemble the flat result dict (see align_raw_compact_from_matrix).

        With ``defer_unresolved`` the phase-B kernel is NOT launched; reads
        without a phase-A anchor are flagged in the returned ``unresolved``
        array instead, so a streaming caller can batch them across chunks
        (phase-B launches are latency-bound on small batches).
        """
        n = state["n"]
        astart = np.zeros(n, dtype=np.int64)
        mask = np.zeros(n, dtype=np.int32)
        passed = np.zeros(n, dtype=bool)
        needs_host = state["needs_host"]
        unresolved_out = np.zeros(n, dtype=bool)

        for bucket, sel, m, reads, blens, packed in state["launches"]:
            out = unpack_compact(np.asarray(packed))
            # phase B: reads without an anchor in the first few positions
            unresolved = ~out["has_anchor"][:m] & (
                blens[:m].astype(np.int64) - self.bidx.k + 1
                > self.phase_a_positions
            )
            if defer_unresolved:
                unresolved_out[sel] = unresolved
                unresolved = np.zeros_like(unresolved)
            if unresolved.any():
                sub = np.flatnonzero(unresolved)
                ms = len(sub)
                Bs = max(self.min_batch, 1 << (ms - 1).bit_length())
                reads_s = np.zeros((Bs, bucket), dtype=np.int8)
                reads_s[:ms] = reads[sub]
                blens_s = np.zeros(Bs, dtype=np.int32)
                blens_s[:ms] = blens[sub]
                out_b = unpack_compact(
                    np.asarray(self._launch_fast_kernel(reads_s, blens_s, bucket, bucket))
                )
                for key in ("astart", "mask", "passed", "needs_host"):
                    out[key][sub] = out_b[key][:ms]

            astart[sel] = out["astart"][:m]
            mask[sel] = out["mask"][:m]
            passed[sel] = out["passed"][:m]
            needs_host[sel] = out["needs_host"][:m]

        result = {"astart": astart, "mask": mask, "passed": passed,
                  "needs_host": needs_host}
        if defer_unresolved:
            result["unresolved"] = unresolved_out
        return result

    def align_raw_compact_full_probe(self, mat: np.ndarray, lens: np.ndarray):
        """Compact alignment probing ALL k-mer positions (single phase);
        used for flushed backlogs of phase-A-unresolved reads."""
        n, width = mat.shape
        lens = np.asarray(lens, dtype=np.int32)
        astart = np.zeros(n, dtype=np.int64)
        mask = np.zeros(n, dtype=np.int32)
        passed = np.zeros(n, dtype=bool)
        needs_host = lens > self.buckets[-1]
        eligible = (lens >= MIN_READ_LENGTH) & ~needs_host
        if eligible.any():
            bucket_arr = np.asarray(self.buckets)
            bucket_idx = np.searchsorted(bucket_arr, lens)
            for bi in np.unique(bucket_idx[eligible]):
                bucket = int(bucket_arr[bi])
                sel = np.flatnonzero(eligible & (bucket_idx == bi))
                m = len(sel)
                B = max(self.min_batch, 1 << (m - 1).bit_length())
                reads = np.zeros((B, bucket), dtype=np.int8)
                take = min(bucket, width)
                reads[:m, :take] = mat[sel, :take]
                blens = np.zeros(B, dtype=np.int32)
                blens[:m] = lens[sel]
                out = unpack_compact(
                    np.asarray(self._launch_fast_kernel(reads, blens, bucket, bucket))
                )
                astart[sel] = out["astart"][:m]
                mask[sel] = out["mask"][:m]
                passed[sel] = out["passed"][:m]
                needs_host[sel] = out["needs_host"][:m]
        return {"astart": astart, "mask": mask, "passed": passed,
                "needs_host": needs_host}

    def align_raw_compact_from_matrix(self, mat: np.ndarray, lens: np.ndarray):
        """Minimum-download batch alignment: the whole filter chain runs on
        device; the result identifies each read's equivalence class as
        (anchor postings start, live-lane bitmask) — see
        `ops.engine_fast.probe_walk_filter` and :meth:`decode_combo`.

        Returns dict arrays over N reads:
          astart (N,) int64, mask (N,) int32, passed (N,) bool,
          needs_host (N,) bool
        """
        return self.compact_collect(self.compact_dispatch(mat, lens))

    def _launch_fast_kernel(self, reads, blens, bucket, p_limit):
        cfg = self.config
        return probe_walk_filter(
            jnp.asarray(reads), jnp.asarray(blens),
            self._dev_fast["bkey_lo"], self._dev_fast["bkey_hi"],
            self._dev_fast["bstart"], self._dev_fast["bcount"],
            self._dev_fast["postings_row"], self._dev_fast["postings_off"],
            self._dev_fast["ref_codes_packed"], self._dev_fast["row_starts"],
            self._dev_fast["row_lengths"],
            jnp.asarray(self._s_min_table(bucket)),
            jnp.int32(cfg.score_threshold),
            jnp.int32(cfg.num_mismatches),
            jnp.bool_(cfg.discard_multiple_matches),
            jnp.bool_(cfg.discard_nonzero_mismatch),
            k=self.bidx.k,
            max_probe=self.bidx.max_probe,
            c_max=self.c_max,
            bucket_mask=self.bidx.n_buckets - 1,
            p_limit=min(p_limit, bucket - self.bidx.k + 1),
            ref_pad=self.bidx.ref_pad,
            use_pallas=self.use_pallas_walk,
        )

    def decode_combo(self, astart: int, mask: int) -> List[int]:
        """(astart, mask) -> sorted distinct eq-class row ids (host-side)."""
        rows = []
        c = 0
        m = int(mask)
        base = int(astart)
        prow = self.bidx.postings_row  # compact astart indexes the bucketized postings
        while m:
            if m & 1:
                rows.append(int(prow[base + c]))
            m >>= 1
            c += 1
        return sorted(set(rows))

    # --- internals --------------------------------------------------------

    def _pad_batch(self, seqs, idxs, bucket):
        B = 1
        while B < len(idxs):
            B *= 2
        B = max(B, self.min_batch)
        reads = np.zeros((B, bucket), dtype=np.int8)
        lens = np.zeros(B, dtype=np.int32)
        for j, i in enumerate(idxs):
            s = seqs[i]
            reads[j, : len(s)] = s
            lens[j] = len(s)
        return reads, lens

    def _run_full_kernel(self, reads, blens, bucket, p_limit):
        out = probe_walk_full(
            jnp.asarray(reads), jnp.asarray(blens),
            self._dev_fast["bkey_lo"], self._dev_fast["bkey_hi"],
            self._dev_fast["bstart"], self._dev_fast["bcount"],
            self._dev_fast["postings_row"], self._dev_fast["postings_off"],
            self._dev_fast["ref_codes_packed"], self._dev_fast["row_starts"],
            self._dev_fast["row_lengths"],
            k=self.bidx.k,
            max_probe=self.bidx.max_probe,
            c_max=self.c_max,
            bucket_mask=self.bidx.n_buckets - 1,
            p_limit=min(p_limit, bucket - self.bidx.k + 1),
            ref_pad=self.bidx.ref_pad,
            use_pallas=self.use_pallas_walk,
        )
        return {k: np.array(v) for k, v in jax.device_get(out).items()}

    def _run_bucket(self, seqs, idxs, bucket, results) -> None:
        reads, lens = self._pad_batch(seqs, idxs, bucket)
        m = len(idxs)

        # two-phase anchor search, like the compact path
        out = self._run_full_kernel(reads, lens, bucket, self.phase_a_positions)
        unresolved = ~out["has_anchor"][:m] & (
            lens[:m].astype(np.int64) - self.bidx.k + 1 > self.phase_a_positions
        )
        if unresolved.any():
            sub = np.flatnonzero(unresolved)
            ms = len(sub)
            Bs = max(self.min_batch, 1 << (ms - 1).bit_length())
            reads_s = np.zeros((Bs, bucket), dtype=np.int8)
            reads_s[:ms] = reads[sub]
            blens_s = np.zeros(Bs, dtype=np.int32)
            blens_s[:ms] = lens[sub]
            out_b = self._run_full_kernel(reads_s, blens_s, bucket, bucket)
            for key in out:
                out[key][sub] = out_b[key][:ms]

        # Host-exact gates + filters.
        ent = batch_entropy(reads, lens)
        cfg = self.config
        for j, i in enumerate(idxs):
            s = seqs[i]
            if ent[j] < MIN_ENTROPY_SCORE:
                results[i] = (None, (FilterReason.HIGH_ENTROPY, 0.0, 0))
                continue
            if out["overflow"][j]:
                # anchor postings exceeded C_MAX — exact host rescue
                results[i] = pseudoalign(s, self.index, cfg, MIN_READ_LENGTH)
                continue
            if not out["has_anchor"][j]:
                results[i] = (None, (FilterReason.NO_MATCH, 0.0, 0))
                continue
            eq = self.decode_combo(int(out["astart"][j]), int(out["mask"][j]))
            score = int(out["score"][j])
            mismatches = int(out["mismatches"][j])
            normalized = score / len(s)  # f64, parity with `src/align.rs:968`
            if cfg.discard_nonzero_mismatch and mismatches != 0:
                results[i] = (None, (FilterReason.DISCARDED_NONZERO_MISMATCH, 0.0, 0))
                continue
            results[i] = filter_alignment_by_metrics(
                eq,
                score,
                normalized,
                cfg.score_threshold,
                cfg.score_percent,
                cfg.discard_multiple_matches,
                cfg.num_mismatches,
                mismatches,
            )
