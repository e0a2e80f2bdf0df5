"""Multi-chip alignment engine over a (data × model) device mesh.

Runs the psum-merged sharded step (`parallel.sharded.make_sharded_step`) —
reads data-parallel across chips, k-mer index model-parallel — behind the
same batch interfaces as `DeviceAlignEngine`:

  * ``align_raw_from_matrix`` — flat arrays for the fast counting path
    (`core.fast_count.FastCounter` detects and uses it);
  * ``align_batch`` — per-read tuples for the forensic path.

Exactness follows the single-chip engine: integer walk on device, f64 gates
on host, host-oracle rescue for unbounded reads.  On a single-host CPU run
the mesh uses the 8 virtual devices from ``xla_force_host_platform_device_count``;
on a pod slice it spans all chips.
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
from nimble_tpu.core.filters import filter_alignment_by_metrics, pseudoalign
from nimble_tpu.index.build import KmerIndex
from nimble_tpu.models.aligner import EQ_PAD, batch_entropy
from nimble_tpu.parallel.sharded import (
    build_sharded_index,
    device_arrays,
    make_sharded_step,
)


class MeshAlignEngine:
    """Data×model sharded engine (see module docstring)."""

    def __init__(
        self,
        index: KmerIndex,
        config: AlignFilterConfig,
        *,
        mesh: Optional[jax.sharding.Mesh] = None,
        n_index_shards: Optional[int] = None,
        c_max: int = 8,
        max_len: int = 1024,
        min_batch: int = 64,
    ):
        self.index = index
        self.config = config
        self.c_max = int(c_max)
        self.max_len = int(max_len)
        self.min_batch = int(min_batch)

        if mesh is None:
            n = len(jax.devices())
            model = n_index_shards or (2 if n % 2 == 0 and n > 1 else 1)
            data = n // model
            mesh = jax.make_mesh((data, model), ("data", "model"))
        self.mesh = mesh
        self.data_shards = mesh.shape["data"]
        model_shards = mesh.shape["model"]

        self.sidx = build_sharded_index(index, model_shards)
        self.step = make_sharded_step(mesh, self.sidx, c_max=self.c_max)
        self._dev = device_arrays(self.sidx)
        # eq-content interning for the compact interface
        self._intern: dict = {}
        self._intern_list: List[List[int]] = []

    # --- fast counting interface -----------------------------------------

    def align_raw_from_matrix(self, mat: np.ndarray, lens: np.ndarray):
        """Same contract as DeviceAlignEngine.align_raw_from_matrix."""
        n, width = mat.shape
        c = self.c_max
        lens = np.asarray(lens, dtype=np.int32)
        passed = np.zeros(n, dtype=bool)
        eq_sorted = np.full((n, c), EQ_PAD, dtype=np.int64)
        needs_host = lens > self.max_len
        eligible = (lens >= MIN_READ_LENGTH) & ~needs_host
        if not eligible.any():
            return {"passed": passed, "eq_sorted": eq_sorted, "needs_host": needs_host}

        sel = np.flatnonzero(eligible)
        m = len(sel)
        # pad batch to a pow2 multiple of the data axis
        B = max(self.min_batch, 1 << (m - 1).bit_length())
        while B % self.data_shards:
            B *= 2
        lmax = int(lens[sel].max())
        reads = np.zeros((B, lmax), dtype=np.int8)
        reads[:m, : min(lmax, width)] = mat[sel, : min(lmax, width)]
        blens = np.zeros(B, dtype=np.int32)
        blens[:m] = lens[sel]

        out = self.step(jnp.asarray(reads), jnp.asarray(blens), *self._dev)
        out = {k: np.array(v) for k, v in jax.device_get(out).items()}

        cfg = self.config
        ent = batch_entropy(reads[:m], blens[:m])
        has_anchor = out["has_anchor"][:m]
        overflow = out["overflow"][:m]
        score = out["score"][:m].astype(np.int64)
        mm = out["mismatches"][:m].astype(np.int64)
        rows = out["rows"][:m].astype(np.int64)
        live = out["live"][:m].astype(bool)

        eq = np.where(live, rows, EQ_PAD)
        eq.sort(axis=1)
        dup = np.zeros_like(live)
        dup[:, 1:] = eq[:, 1:] == eq[:, :-1]
        eq = np.where(dup, EQ_PAD, eq)
        eq.sort(axis=1)
        n_distinct = (eq != EQ_PAD).sum(axis=1)

        normalized = score / blens[:m].astype(np.float64)
        ok = (
            (ent >= MIN_ENTROPY_SCORE)
            & has_anchor
            & (score >= cfg.score_threshold)
            & (normalized >= cfg.score_percent)
            & (n_distinct > 0)
            & (mm <= cfg.num_mismatches)
        )
        if cfg.discard_multiple_matches:
            ok &= n_distinct <= 1
        if cfg.discard_nonzero_mismatch:
            ok &= mm == 0

        host_mask = overflow & (ent >= MIN_ENTROPY_SCORE)
        passed[sel] = ok & ~host_mask
        eq_sorted[sel] = eq
        needs_host[sel] = host_mask
        return {"passed": passed, "eq_sorted": eq_sorted, "needs_host": needs_host}

    # --- compact interface (for FastCounter) ------------------------------
    # Combo ids here are INTERNED eq-class ids (the sharded step has no
    # single global postings start), decoded by decode_combo below.

    def align_raw_compact_from_matrix(self, mat: np.ndarray, lens: np.ndarray):
        raw = self.align_raw_from_matrix(mat, lens)
        n = mat.shape[0]
        astart = np.zeros(n, dtype=np.int64)
        mask = np.zeros(n, dtype=np.int32)
        passed_idx = np.flatnonzero(raw["passed"])
        if len(passed_idx):
            rows = raw["eq_sorted"][passed_idx]
            uniq, inv = np.unique(rows, axis=0, return_inverse=True)
            ids = np.empty(len(uniq), dtype=np.int64)
            for u_i, u in enumerate(uniq):
                key = u.tobytes()
                interned = self._intern.get(key)
                if interned is None:
                    interned = len(self._intern_list)
                    self._intern[key] = interned
                    self._intern_list.append(
                        [int(x) for x in u if x != EQ_PAD]
                    )
                ids[u_i] = interned
            astart[passed_idx] = ids[inv]
            mask[passed_idx] = 1  # nonzero marker; identity lives in astart
        return {
            "astart": astart,
            "mask": mask,
            "passed": raw["passed"],
            "needs_host": raw["needs_host"],
        }

    def decode_combo(self, astart: int, mask: int) -> List[int]:
        return list(self._intern_list[int(astart)])

    # --- forensic interface ----------------------------------------------

    def align_batch(self, seqs: Sequence[Optional[np.ndarray]]):
        n = len(seqs)
        results: list = [(None, None)] * n
        cfg = self.config

        device_idx = []
        for i, s in enumerate(seqs):
            if s is None:
                continue
            if len(s) < MIN_READ_LENGTH:
                results[i] = (None, (FilterReason.SHORT_READ, 0.0, 0))
                continue
            if len(s) > self.max_len:
                results[i] = pseudoalign(s, self.index, cfg, MIN_READ_LENGTH)
                continue
            device_idx.append(i)
        if not device_idx:
            return results

        m = len(device_idx)
        B = max(self.min_batch, 1 << (m - 1).bit_length())
        while B % self.data_shards:
            B *= 2
        lmax = max(len(seqs[i]) for i in device_idx)
        reads = np.zeros((B, lmax), dtype=np.int8)
        blens = np.zeros(B, dtype=np.int32)
        for j, i in enumerate(device_idx):
            reads[j, : len(seqs[i])] = seqs[i]
            blens[j] = len(seqs[i])

        out = self.step(jnp.asarray(reads), jnp.asarray(blens), *self._dev)
        out = {k: np.array(v) for k, v in jax.device_get(out).items()}
        ent = batch_entropy(reads[:m], blens[:m])

        # host-exact gates, like DeviceAlignEngine._run_bucket
        for j, i in enumerate(device_idx):
            s = seqs[i]
            if ent[j] < MIN_ENTROPY_SCORE:
                results[i] = (None, (FilterReason.HIGH_ENTROPY, 0.0, 0))
                continue
            if out["overflow"][j]:
                results[i] = pseudoalign(s, self.index, cfg, MIN_READ_LENGTH)
                continue
            if not out["has_anchor"][j]:
                results[i] = (None, (FilterReason.NO_MATCH, 0.0, 0))
                continue
            eq = sorted(set(out["rows"][j][out["live"][j].astype(bool)].tolist()))
            score = int(out["score"][j])
            mismatches = int(out["mismatches"][j])
            normalized = score / len(s)
            if cfg.discard_nonzero_mismatch and mismatches != 0:
                results[i] = (None, (FilterReason.DISCARDED_NONZERO_MISMATCH, 0.0, 0))
                continue
            results[i] = filter_alignment_by_metrics(
                eq, score, normalized,
                cfg.score_threshold, cfg.score_percent,
                cfg.discard_multiple_matches, cfg.num_mismatches, mismatches,
            )
        return results
