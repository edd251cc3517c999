"""Pin the wasm-export contract that bindings/wasm/kernels-index.mjs uses.

No JS runtime ships in this image, so the browser InMemoryIndex glue can't
execute here (its in-browser suite is bindings/wasm/test.html). These tests
are the committed mitigation, same pattern as test_wasm_glue_contract.py:

  (a) statically cross-check every ``this.ex.<name>(...)`` call site in the
      glue against the COMMITTED artifact's export table and function
      arities (executed through wasm_vm.py, so a drifted artifact fails
      even if gen_kernels.py changed consistently);
  (b) replay the glue's exact call sequences — slot-arena writes, i32
      occupancy words, topk_cosine search, the filter-pushdown scratch
      occupancy copy, growth copy — through the interpreter and assert the
      reference InMemoryIndex semantics (reference:
      bindings/wasm/src/index.rs:41-331).
"""
from __future__ import annotations

import importlib.util
import pathlib
import re

import numpy as np
import pytest

WASM_DIR = pathlib.Path(__file__).resolve().parents[2] / "bindings" / "wasm"
GLUE = WASM_DIR / "kernels-index.mjs"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, WASM_DIR / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


vm = _load("wasm_vm")


@pytest.fixture()
def inst():
    return vm.instantiate((WASM_DIR / "fvdb_kernels.wasm").read_bytes())


# ------------------------------------------------------------------- static
def test_every_glue_export_call_exists_with_matching_arity(inst):
    src = GLUE.read_text()
    # this.ex.name(args...) — single-line call sites; memory accesses like
    # this.ex.memory.buffer are attribute reads, not calls
    calls = re.findall(r"this\.ex\.(\w+)\(([^()]*)\)", src)
    called = {}
    for name, args in calls:
        n_args = len([a for a in args.split(",") if a.strip()])
        called.setdefault(name, set()).add(n_args)
    assert called, "no export call sites found — glue rewritten? update test"
    mod = inst.m
    for name, arities in called.items():
        assert name in mod.exports, f"glue calls missing export {name!r}"
        kind, idx = mod.exports[name]
        assert kind == 0, f"{name} is not a function export"
        params, _results = mod.types[mod.func_types[idx]]
        for n_args in arities:
            assert n_args == len(params), (
                f"{name}: glue passes {n_args} args, wasm type takes "
                f"{len(params)}"
            )
    expected = {"alloc", "topk_cosine", "cosine_sim", "l2_sq"}
    assert expected <= set(called), f"glue no longer calls {expected - set(called)}"
    assert "memory" in mod.exports


def test_multi_instance_isolation_contract():
    """The glue gives every InMemoryIndex its OWN instance because the
    bump allocator's reset() would clobber a sibling's arena — pin that
    both the hazard and the mitigation are real."""
    data = (WASM_DIR / "fvdb_kernels.wasm").read_bytes()
    i1, i2 = vm.instantiate(data), vm.instantiate(data)
    p1 = i1.call("alloc", 64)
    i1.mem_write_f32(p1, [7.0] * 16)
    # the hazard: reset() on the SAME instance hands out the same region
    assert i1.call("reset") is None
    assert i1.call("alloc", 64) == p1
    # the mitigation: a second instance has independent memory + allocator
    p2 = i2.call("alloc", 64)
    i2.mem_write_f32(p2, [9.0] * 16)
    assert i1.mem_read_f32(p1, 1)[0] == 7.0
    assert i2.mem_read_f32(p2, 1)[0] == 9.0


# ------------------------------------------------------------------- replay
class _TwinIndex:
    """Python twin of kernels-index.mjs: same wasm call sequence, same
    slot-arena layout (id/metadata maps host-side, occupancy i32 words +
    f32 rows in wasm memory)."""

    INITIAL_SLOTS = 4  # tiny so tests exercise growth copies

    def __init__(self, inst, dim):
        self.inst = inst
        self.dim = dim
        self.cap = 0
        self.vecs_ptr = 0
        self.occ_ptr = 0
        self.slots: list = []
        self.id_to_slot: dict = {}
        self.metadata: dict = {}
        self.free: list = []
        self._grow(self.INITIAL_SLOTS)

    def _grow(self, new_cap):
        nv = self.inst.call("alloc", new_cap * self.dim * 4)
        no = self.inst.call("alloc", new_cap * 4)
        if self.cap:
            old_v = self.inst.mem_read_f32(self.vecs_ptr, self.cap * self.dim)
            old_o = self.inst.mem_read_i32(self.occ_ptr, self.cap)
            self.inst.mem_write_f32(nv, old_v)
            self.inst.m.memory[no:no + 4 * self.cap] = np.asarray(
                old_o, np.int32).tobytes()
        self.inst.m.memory[no + 4 * self.cap:no + 4 * new_cap] = bytes(
            4 * (new_cap - self.cap))
        self.vecs_ptr, self.occ_ptr, self.cap = nv, no, new_cap

    def _slot_for(self):
        if self.free:
            return self.free.pop()
        if len(self.slots) >= self.cap:
            self._grow(2 * self.cap)
        self.slots.append(None)
        return len(self.slots) - 1

    def add(self, vid, vec, meta=None):
        if vid in self.id_to_slot:
            raise ValueError(f"Vector with ID '{vid}' already exists")
        if len(vec) != self.dim:
            raise ValueError("dimension mismatch")
        s = self._slot_for()
        self.inst.mem_write_f32(self.vecs_ptr + s * self.dim * 4, list(vec))
        self.inst.m.memory[self.occ_ptr + 4 * s:self.occ_ptr + 4 * s + 4] = (
            np.int32(1).tobytes())
        self.slots[s] = vid
        self.id_to_slot[vid] = s
        self.metadata[vid] = meta

    def update(self, vid, vec):
        s = self.id_to_slot[vid]
        self.inst.mem_write_f32(self.vecs_ptr + s * self.dim * 4, list(vec))

    def delete(self, vid):
        s = self.id_to_slot.pop(vid)
        self.inst.m.memory[self.occ_ptr + 4 * s:self.occ_ptr + 4 * s + 4] = (
            np.int32(0).tobytes())
        self.slots[s] = None
        self.metadata.pop(vid, None)
        self.free.append(s)

    def search(self, q, k, keep=None):
        n = len(self.slots)
        if n == 0 or k <= 0:
            return []
        occ_ptr = self.occ_ptr
        if keep is not None:
            occ = self.inst.mem_read_i32(self.occ_ptr, n)
            occ2 = [o if (o and keep(self.slots[i])) else 0
                    for i, o in enumerate(occ)]
            occ_ptr = self.inst.call("alloc", 4 * n)
            self.inst.m.memory[occ_ptr:occ_ptr + 4 * n] = np.asarray(
                occ2, np.int32).tobytes()
        pq = self.inst.call("alloc", 4 * self.dim)
        self.inst.mem_write_f32(pq, list(q))
        poi = self.inst.call("alloc", 4 * k)
        pod = self.inst.call("alloc", 4 * k)
        cnt = self.inst.call("topk_cosine", self.vecs_ptr, occ_ptr, n,
                             self.dim, pq, k, poi, pod)
        oi = self.inst.mem_read_i32(poi, cnt)
        od = self.inst.mem_read_f32(pod, cnt)
        return [
            {"id": self.slots[oi[i]], "distance": od[i],
             "metadata": self.metadata.get(self.slots[oi[i]])}
            for i in range(cnt)
        ]


def test_replay_index_lifecycle(inst):
    ix = _TwinIndex(inst, 3)
    ix.add("a", [1, 0, 0], {"genre": "jazz", "year": 2001})
    ix.add("b", [0, 1, 0], {"genre": "rock", "year": 1995})
    ix.add("c", [0.9, 0.1, 0], {"genre": "jazz", "year": 2010})
    with pytest.raises(ValueError):
        ix.add("a", [0, 0, 1])

    hits = ix.search([1, 0, 0], 2)
    assert [h["id"] for h in hits] == ["a", "c"]
    assert abs(hits[0]["distance"]) < 1e-5  # exact match, 1 - cos ~ 0
    assert hits[0]["metadata"]["genre"] == "jazz"

    # exact filter pushdown via the scratch occupancy copy
    fhits = ix.search([1, 0, 0], 3,
                      keep=lambda vid: ix.metadata[vid]["year"] >= 2005)
    assert [h["id"] for h in fhits] == ["c"]

    # update moves b from orthogonal (d ~ 1) to near-parallel: it must now
    # outrank c (the exact-match a keeps top-1)
    ix.update("b", [0.99, 0.01, 0])
    assert [h["id"] for h in ix.search([1, 0, 0], 2)] == ["a", "b"]

    ix.delete("b")
    assert "b" not in {h["id"] for h in ix.search([1, 0, 0], 3)}

    # slot reuse: the freed slot is recycled for the next add
    ix.add("d", [0, 0, 1], None)
    assert ix.id_to_slot["d"] == 1  # b's old slot


def test_replay_growth_preserves_rows(inst):
    """Arena growth (alloc new region + copy rows/occupancy) must keep
    every previously-added vector searchable — this is the glue's _grow."""
    rng = np.random.default_rng(5)
    dim = 8
    ix = _TwinIndex(inst, dim)
    vecs = rng.standard_normal((37, dim)).astype(np.float32)
    for i in range(37):  # grows 4 -> 8 -> 16 -> 32 -> 64
        ix.add(f"v{i}", vecs[i].tolist())
    assert ix.cap == 64
    for probe in (0, 3, 17, 36):
        got = ix.search(vecs[probe].tolist(), 1)
        assert got[0]["id"] == f"v{probe}", probe
        assert abs(got[0]["distance"]) < 1e-5


def test_replay_matches_numpy_full_ranking(inst):
    rng = np.random.default_rng(6)
    dim, n, k = 12, 50, 50
    ix = _TwinIndex(inst, dim)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    for i in range(n):
        ix.add(f"v{i}", vecs[i].tolist())
    q = rng.standard_normal(dim).astype(np.float32)
    got = [h["id"] for h in ix.search(q.tolist(), k)]
    d_ref = 1.0 - (vecs @ q) / (np.linalg.norm(vecs, axis=1)
                                * np.linalg.norm(q))
    want = [f"v{i}" for i in np.argsort(d_ref, kind="stable")]
    assert got == want
