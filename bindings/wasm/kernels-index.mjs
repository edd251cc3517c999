/**
 * Browser InMemoryIndex on the COMMITTED fvdb_kernels.wasm — zero toolchain.
 *
 * Full surface parity with the reference wasm-bindgen crate (reference:
 * bindings/wasm/src/index.rs:41-331 — InMemoryIndex brute-force cosine
 * scan, distance = 1 - cos, duplicate/dimension checks, update/delete,
 * serialize/deserialize; index.rs:259-331 — SearchFilter; video.rs —
 * VideoSimilarityIndex / VideoRecommender / VideoClustering), but the
 * scored scan runs INSIDE the shipped wasm artifact (topk_cosine: a
 * masked top-k over an [n, dim] f32 slot arena), not in JS.
 *
 * Design: the wasm module is a kernel arena, not an object store — id
 * strings, metadata, and the slot freelist live in JS; the wasm memory
 * holds the vector slots and an i32 occupancy word per slot that the scan
 * honors. Metadata filters are pushed down EXACTLY by ANDing the filter
 * verdicts into a scratch occupancy copy before the scan (the reference
 * pre-filters then fully sorts, index.rs:164-209 — same result set).
 *
 * Memory: the artifact has a bump allocator (alloc/reset, no free). Each
 * index owns its OWN wasm instance, so reset()-based helpers elsewhere
 * can't clobber it; capacity growth doubles the slot arena and abandons
 * the old region (bounded: total leak < 1x the final arena size).
 *
 *   import { InMemoryIndex, SearchFilter } from "./kernels-index.mjs";
 *   const ix = await InMemoryIndex.create(384, "./fvdb_kernels.wasm");
 *   ix.addVector("a", vec, { genre: "jazz" });
 *   const hits = ix.search(query, 10);   // [{id, distance, metadata}]
 */

const INITIAL_SLOTS = 256;

async function instantiateKernels(src) {
  let bytes = src;
  if (typeof src === "string") {
    const res = await fetch(src);
    bytes = await res.arrayBuffer();
  }
  if (bytes instanceof WebAssembly.Module) {
    return WebAssembly.instantiate(bytes, {});
  }
  const { instance } = await WebAssembly.instantiate(bytes, {});
  return instance;
}

export class SearchFilter {
  constructor() { this.conds = []; }

  /** reference: index.rs:275-278 */
  addStringFilter(field, value) {
    this.conds.push({ t: "s", field, value });
    return this;
  }

  /** reference: index.rs:280-287 (eq/ne/gt/gte/lt/lte) */
  addNumberFilter(field, operator, value) {
    if (!["eq", "ne", "gt", "gte", "lt", "lte"].includes(operator)) {
      throw new Error(`unknown operator ${operator}`);
    }
    this.conds.push({ t: "n", field, op: operator, value });
    return this;
  }

  // aliases kept for code written against the embedded-runtime glue
  addStringEquals(field, value) { return this.addStringFilter(field, value); }
  addNumeric(field, op, value) { return this.addNumberFilter(field, op, value); }

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

export class InMemoryIndex {
  /** @private use InMemoryIndex.create() */
  constructor(instance, dim) {
    this.ex = instance.exports;
    this.dim = dim;
    this.cap = 0;
    this.vecsPtr = 0;
    this.occPtr = 0;
    this.slots = [];          // slot -> id | null
    this.idToSlot = new Map();
    this.metadata = new Map(); // id -> metadata object | null
    this.free = [];           // recycled slots
    this._scratchPtr = 0;
    this._scratchBytes = 0;
    this._grow(INITIAL_SLOTS);
  }

  /**
   * @param {number} dimension
   * @param {ArrayBuffer|Uint8Array|string|WebAssembly.Module} wasmSrc
   *        bytes, a fetchable URL, or a precompiled module (shared
   *        compilation across many indexes)
   */
  static async create(dimension, wasmSrc) {
    if (!(Number.isInteger(dimension) && dimension > 0)) {
      throw new Error(`invalid dimension ${dimension}`);
    }
    return new InMemoryIndex(await instantiateKernels(wasmSrc), dimension);
  }

  // ------------------------------------------------------------ memory mgmt
  _heapF32(ptr, len) { return new Float32Array(this.ex.memory.buffer, ptr, len); }
  _heapI32(ptr, len) { return new Int32Array(this.ex.memory.buffer, ptr, len); }

  _grow(newCap) {
    const nv = this.ex.alloc(newCap * this.dim * 4);
    const no = this.ex.alloc(newCap * 4);
    // memory.grow may have moved the buffer — re-derive views AFTER allocs
    if (this.cap > 0) {
      this._heapF32(nv, this.cap * this.dim)
        .set(this._heapF32(this.vecsPtr, this.cap * this.dim));
      this._heapI32(no, this.cap).set(this._heapI32(this.occPtr, this.cap));
    }
    this._heapI32(no + this.cap * 4, newCap - this.cap).fill(0);
    this.vecsPtr = nv;
    this.occPtr = no;
    this.cap = newCap;
  }

  _scratch(nBytes) {
    if (nBytes > this._scratchBytes) {
      const want = Math.max(nBytes, 2 * this._scratchBytes);
      this._scratchPtr = this.ex.alloc(want);
      this._scratchBytes = want;
    }
    return this._scratchPtr;
  }

  _slotFor(id) {
    if (this.free.length) return this.free.pop();
    if (this.slots.length >= this.cap) this._grow(2 * this.cap);
    this.slots.push(null);
    return this.slots.length - 1;
  }

  _checkDim(vector, what) {
    if (vector.length !== this.dim) {
      throw new Error(
        `${what} dimension mismatch: expected ${this.dim}, got ${vector.length}`);
    }
  }

  // ----------------------------------------------------------------- writes
  /** reference: index.rs:57-83 (duplicate-id + dimension errors) */
  addVector(id, vector, metadata = null) {
    this._checkDim(vector, "Vector");
    if (this.idToSlot.has(id)) {
      throw new Error(`Vector with ID '${id}' already exists`);
    }
    const slot = this._slotFor(id);
    this._heapF32(this.vecsPtr + slot * this.dim * 4, this.dim)
      .set(Float32Array.from(vector));
    this._heapI32(this.occPtr + slot * 4, 1)[0] = 1;
    this.slots[slot] = id;
    this.idToSlot.set(id, slot);
    this.metadata.set(id, metadata ?? null);
  }

  /** reference: index.rs:85-120 */
  addVectorWithMetadata(id, vector, metadata) {
    this.addVector(id, vector, metadata);
  }

  /** reference: index.rs:210-227 */
  updateVector(id, vector) {
    this._checkDim(vector, "Vector");
    const slot = this.idToSlot.get(id);
    if (slot === undefined) throw new Error(`Vector with ID '${id}' not found`);
    this._heapF32(this.vecsPtr + slot * this.dim * 4, this.dim)
      .set(Float32Array.from(vector));
  }

  /** reference: index.rs:229-239 */
  deleteVector(id) {
    const slot = this.idToSlot.get(id);
    if (slot === undefined) throw new Error(`Vector with ID '${id}' not found`);
    this._heapI32(this.occPtr + slot * 4, 1)[0] = 0;
    this.slots[slot] = null;
    this.idToSlot.delete(id);
    this.metadata.delete(id);
    this.free.push(slot);
  }

  /** reference: index.rs:241-243 */
  size() { return this.idToSlot.size; }
  get length() { return this.idToSlot.size; }

  // ---------------------------------------------------------------- queries
  /** run the wasm scan at [qBase..] scratch, collect [{id, distance,
   * metadata}] — the single scan/assembly used by every search flavor */
  _runScan(query, k, occPtr, qBase) {
    const n = this.slots.length;
    const qPtr = qBase, oiPtr = qBase + this.dim * 4, odPtr = oiPtr + k * 4;
    this._heapF32(qPtr, this.dim).set(Float32Array.from(query));
    const cnt = this.ex.topk_cosine(
      this.vecsPtr, occPtr, n, this.dim, qPtr, k, oiPtr, odPtr);
    const oi = this._heapI32(oiPtr, cnt);
    const od = this._heapF32(odPtr, cnt);
    const out = [];
    for (let i = 0; i < cnt; i++) {
      const id = this.slots[oi[i]];
      out.push({ id, distance: od[i], metadata: this.metadata.get(id) ?? null });
    }
    return out;
  }

  _searchOcc(query, k, occPtr) {
    if (this.slots.length === 0 || k <= 0) return [];
    // scratch layout: [q f32*dim][oi i32*k][od f32*k]
    const base = this._scratch((this.dim + 2 * k) * 4);
    return this._runScan(query, k, occPtr, base);
  }

  /** Exact top-k by cosine distance (1 - cos). reference: index.rs:122-161 */
  search(query, k) {
    this._checkDim(query, "Query");
    return this._searchOcc(query, k, this.occPtr);
  }

  /**
   * Exact filtered top-k: the filter verdict is ANDed into a scratch
   * occupancy copy and the wasm scan runs over that — same result set as
   * the reference's pre-filter + full sort (index.rs:164-209), without
   * scoring excluded rows.
   */
  searchWithFilter(query, k, filter) {
    this._checkDim(query, "Query");
    return this._searchPredicate(
      query, k, (id) => filter.matches(this.metadata.get(id) ?? null));
  }

  _searchPredicate(query, k, keep) {
    const n = this.slots.length;
    if (n === 0 || k <= 0) return [];
    // scratch layout: [occ2 i32*n][q f32*dim][oi i32*k][od f32*k]
    const base = this._scratch((n + this.dim + 2 * k) * 4);
    const occ2 = base;
    const occSrc = this._heapI32(this.occPtr, n);
    const occDst = this._heapI32(occ2, n);
    for (let s = 0; s < n; s++) {
      occDst[s] = occSrc[s] && keep(this.slots[s]) ? 1 : 0;
    }
    return this._runScan(query, k, occ2, base + n * 4);
  }

  // ------------------------------------------------------------ persistence
  /**
   * Compact binary snapshot (the reference ships bincode of its entries,
   * index.rs:246-257; this is the same information in an explicit layout):
   *   magic "FVK1" | u32 dim | u32 count |
   *   per entry: u32 idLen | id utf8 | f32*dim | u32 metaLen | meta JSON utf8
   */
  serialize() {
    const enc = new TextEncoder();
    const parts = [];
    let total = 12;
    for (const [id, slot] of this.idToSlot) {
      const idB = enc.encode(id);
      const meta = this.metadata.get(id);
      const metaB = meta == null ? new Uint8Array(0)
        : enc.encode(JSON.stringify(meta));
      const vec = this._heapF32(
        this.vecsPtr + slot * this.dim * 4, this.dim).slice();
      parts.push([idB, vec, metaB]);
      total += 4 + idB.length + this.dim * 4 + 4 + metaB.length;
    }
    const out = new Uint8Array(total);
    const dv = new DataView(out.buffer);
    out.set([0x46, 0x56, 0x4B, 0x31], 0); // "FVK1"
    dv.setUint32(4, this.dim, true);
    dv.setUint32(8, parts.length, true);
    let o = 12;
    for (const [idB, vec, metaB] of parts) {
      dv.setUint32(o, idB.length, true); o += 4;
      out.set(idB, o); o += idB.length;
      out.set(new Uint8Array(vec.buffer, vec.byteOffset, this.dim * 4), o);
      o += this.dim * 4;
      dv.setUint32(o, metaB.length, true); o += 4;
      out.set(metaB, o); o += metaB.length;
    }
    return out;
  }

  /** reference: index.rs:252-257 */
  static async deserialize(bytes, wasmSrc) {
    const u8 = bytes instanceof Uint8Array ? bytes : new Uint8Array(bytes);
    const dv = new DataView(u8.buffer, u8.byteOffset, u8.byteLength);
    if (u8.length < 12 || dv.getUint32(0, false) !== 0x46564B31) {
      throw new Error("not an InMemoryIndex snapshot");
    }
    const dim = dv.getUint32(4, true);
    const count = dv.getUint32(8, true);
    const ix = await InMemoryIndex.create(dim, wasmSrc);
    const dec = new TextDecoder();
    let o = 12;
    for (let i = 0; i < count; i++) {
      const idLen = dv.getUint32(o, true); o += 4;
      const id = dec.decode(u8.subarray(o, o + idLen)); o += idLen;
      const vec = new Float32Array(dim);
      vec.set(new Float32Array(u8.slice(o, o + dim * 4).buffer)); o += dim * 4;
      const metaLen = dv.getUint32(o, true); o += 4;
      const meta = metaLen
        ? JSON.parse(dec.decode(u8.subarray(o, o + metaLen))) : null;
      o += metaLen;
      ix.addVector(id, vec, meta);
    }
    return ix;
  }

  // ------------------------------------------------------------ vector math
  cosineSimilarity(a, b) {
    if (a.length !== b.length) {
      throw new Error(`Dimension mismatch: ${a.length} != ${b.length}`);
    }
    const base = this._scratch(a.length * 8);
    this._heapF32(base, a.length).set(Float32Array.from(a));
    this._heapF32(base + a.length * 4, b.length).set(Float32Array.from(b));
    return this.ex.cosine_sim(base, base + a.length * 4, a.length);
  }

  euclideanDistance(a, b) {
    if (a.length !== b.length) {
      throw new Error(`Dimension mismatch: ${a.length} != ${b.length}`);
    }
    const base = this._scratch(a.length * 8);
    this._heapF32(base, a.length).set(Float32Array.from(a));
    this._heapF32(base + a.length * 4, b.length).set(Float32Array.from(b));
    return Math.sqrt(this.ex.l2_sq(base, base + a.length * 4, a.length));
  }
}

// --------------------------------------------------------------------- video
/** reference: bindings/wasm/src/video.rs:40-86 — similarity = cosine,
 * descending; the query video itself appears in its own results. */
export class VideoSimilarityIndex {
  constructor(ix) { this.ix = ix; this.tags = new Map(); }

  static async create(dimension, wasmSrc) {
    return new VideoSimilarityIndex(
      await InMemoryIndex.create(dimension, wasmSrc));
  }

  addVideo(id, embedding, tags = []) {
    this.ix.addVector(id, embedding, { tags });
    this.tags.set(id, tags);
  }

  findSimilar(videoId, k) {
    const slot = this.ix.idToSlot.get(videoId);
    if (slot === undefined) throw new Error(`Video '${videoId}' not found`);
    const q = this.ix._heapF32(
      this.ix.vecsPtr + slot * this.ix.dim * 4, this.ix.dim).slice();
    return this.ix.search(q, k)
      .map((r) => ({ id: r.id, similarity: 1.0 - r.distance }));
  }
}

/** reference: video.rs:120-205 — mean of watched embeddings, recommend
 * top-k unwatched by cosine similarity with each video's category. */
export class VideoRecommender {
  constructor(ix) { this.ix = ix; this.category = new Map(); }

  static async create(dimension, wasmSrc) {
    return new VideoRecommender(await InMemoryIndex.create(dimension, wasmSrc));
  }

  addVideo(id, embedding, category) {
    this.ix.addVector(id, embedding, { category });
    this.category.set(id, category);
  }

  recommendFromHistory(watchHistory, k) {
    const dim = this.ix.dim;
    const avg = new Float32Array(dim);
    let count = 0;
    for (const id of watchHistory) {
      const slot = this.ix.idToSlot.get(id);
      if (slot === undefined) continue;
      const v = this.ix._heapF32(this.ix.vecsPtr + slot * dim * 4, dim);
      for (let i = 0; i < dim; i++) avg[i] += v[i];
      count += 1;
    }
    if (count === 0) return [];
    for (let i = 0; i < dim; i++) avg[i] /= count;
    const watched = new Set(watchHistory);
    return this.ix._searchPredicate(avg, k, (id) => !watched.has(id))
      .map((r) => ({
        id: r.id,
        score: 1.0 - r.distance,
        category: this.category.get(r.id) ?? "unknown",
      }));
  }
}

/** reference: video.rs:207-260 — plain Lloyd k-means over the embeddings
 * (deterministic first-k init), returning {clusterId, centroid, videoIds}. */
export class VideoClustering {
  constructor(dimension) {
    this.dim = dimension;
    this.ids = [];
    this.embs = [];
  }

  static async create(dimension) { return new VideoClustering(dimension); }

  addVideo(id, embedding) {
    if (embedding.length !== this.dim) {
      throw new Error(
        `Vector dimension mismatch: expected ${this.dim}, got ${embedding.length}`);
    }
    this.ids.push(id);
    this.embs.push(Float32Array.from(embedding));
  }

  cluster(k, iterations = 10) {
    const n = this.ids.length;
    if (n === 0 || k <= 0) return [];
    k = Math.min(k, n);
    const dim = this.dim;
    let centroids = this.embs.slice(0, k).map((e) => e.slice());
    let assign = new Array(n).fill(0);
    for (let it = 0; it < iterations; it++) {
      for (let i = 0; i < n; i++) {
        let best = 0, bestD = Infinity;
        for (let c = 0; c < k; c++) {
          let d = 0;
          for (let j = 0; j < dim; j++) {
            const t = this.embs[i][j] - centroids[c][j];
            d += t * t;
          }
          if (d < bestD) { bestD = d; best = c; }
        }
        assign[i] = best;
      }
      const sums = Array.from({ length: k }, () => new Float64Array(dim));
      const counts = new Array(k).fill(0);
      for (let i = 0; i < n; i++) {
        counts[assign[i]] += 1;
        for (let j = 0; j < dim; j++) sums[assign[i]][j] += this.embs[i][j];
      }
      for (let c = 0; c < k; c++) {
        if (!counts[c]) continue; // empty cluster keeps its centroid
        for (let j = 0; j < dim; j++) centroids[c][j] = sums[c][j] / counts[c];
      }
    }
    return centroids.map((centroid, c) => ({
      clusterId: c,
      centroid: Array.from(centroid),
      videoIds: this.ids.filter((_, i) => assign[i] === c),
    }));
  }
}

export default InMemoryIndex;
