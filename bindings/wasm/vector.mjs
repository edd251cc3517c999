/**
 * Vector / VectorBatch helpers — parity with the reference wasm crate's
 * vector surface (reference: bindings/wasm/src/vector.rs:1-144 — Vector
 * {new, dimension, get, normalize, magnitude}, VectorBatch {addVector,
 * length, computeSimilarities}, cosine_similarity, euclidean_distance,
 * cosine_similarity_simd).
 *
 * The scalar math is plain JS (the reference's is plain Rust — its "simd"
 * export is an acknowledged stub that calls the scalar path,
 * vector.rs:138-144). Here the accelerated variant is REAL: bind the
 * committed fvdb_kernels.wasm via bindKernels() and
 * cosineSimilaritySimd / VectorBatch.computeSimilarities execute inside
 * the artifact's cosine_sim kernel instead of JS.
 *
 *   import { Vector, VectorBatch, cosineSimilarity, bindKernels }
 *     from "./vector.mjs";
 *   import { FvdbKernels } from "./kernels.mjs";
 *   bindKernels(await FvdbKernels.load("./fvdb_kernels.wasm"));  // optional
 *   const sim = cosineSimilarity(new Vector([1, 0]), new Vector([1, 1]));
 */

// module-level FvdbKernels instance; null = pure-JS paths everywhere
let _kernels = null;

/** Route the accelerated entry points through a loaded FvdbKernels
 *  (kernels.mjs). Pass null to unbind. Returns the previous binding. */
export function bindKernels(kernels) {
  const prev = _kernels;
  _kernels = kernels;
  return prev;
}

function _checkSameDim(a, b) {
  if (a.dimension() !== b.dimension()) {
    throw new Error(
      `Dimension mismatch: ${a.dimension()} != ${b.dimension()}`);
  }
}

function _cosineScalar(a, b) {
  let dot = 0, ma = 0, mb = 0;
  for (let i = 0; i < a.length; i++) {
    dot += a[i] * b[i];
    ma += a[i] * a[i];
    mb += b[i] * b[i];
  }
  // zero-magnitude convention matches the reference (vector.rs:130-135)
  return ma > 0 && mb > 0 ? dot / (Math.sqrt(ma) * Math.sqrt(mb)) : 0;
}

export class Vector {
  /** @param {Float32Array|number[]} data stored as f32 (reference stores
   *  Vec<f32>; JS number inputs round to f32 on construction) */
  constructor(data) {
    this.data = data instanceof Float32Array ? data : Float32Array.from(data);
  }

  dimension() { return this.data.length; }

  /** reference: vector.rs:22-27 (out-of-bounds is an error, not undefined) */
  get(index) {
    if (!(Number.isInteger(index) && index >= 0 && index < this.data.length)) {
      throw new Error(`Index ${index} out of bounds`);
    }
    return this.data[index];
  }

  magnitude() {
    let s = 0;
    for (let i = 0; i < this.data.length; i++) s += this.data[i] * this.data[i];
    return Math.sqrt(s);
  }

  /** Unit-scaled copy; a zero vector normalizes to a copy of itself
   *  (reference: vector.rs:29-40). */
  normalize() {
    const m = this.magnitude();
    if (m <= 0) return new Vector(this.data.slice());
    const out = new Float32Array(this.data.length);
    for (let i = 0; i < this.data.length; i++) out[i] = this.data[i] / m;
    return new Vector(out);
  }

  asArray() { return this.data; }
}

export class VectorBatch {
  constructor() { this.vectors = []; }

  addVector(vector) {
    if (!(vector instanceof Vector)) throw new Error("expected a Vector");
    this.vectors.push(vector);
  }

  length() { return this.vectors.length; }

  /** Cosine similarity of every batch member against `query`, in insert
   *  order (reference: vector.rs:79-84). Executes inside the committed
   *  wasm artifact when kernels are bound. */
  computeSimilarities(query) {
    const q = query.asArray();
    return this.vectors.map((v) =>
      _kernels ? _kernels.cosineSim(v.asArray(), q)
               : _cosineScalar(v.asArray(), q));
  }
}

/** reference: vector.rs:86-97 */
export function cosineSimilarity(vec1, vec2) {
  _checkSameDim(vec1, vec2);
  return _cosineScalar(vec1.asArray(), vec2.asArray());
}

/** reference: vector.rs:99-118 (non-squared euclidean) */
export function euclideanDistance(vec1, vec2) {
  _checkSameDim(vec1, vec2);
  if (_kernels) {
    return Math.sqrt(_kernels.l2Sq(vec1.asArray(), vec2.asArray()));
  }
  const a = vec1.asArray(), b = vec2.asArray();
  let s = 0;
  for (let i = 0; i < a.length; i++) {
    const d = a[i] - b[i];
    s += d * d;
  }
  return Math.sqrt(s);
}

/** The reference exports a "simd" name whose body IS the scalar path
 *  (vector.rs:138-144). Here it runs the artifact's wasm kernel when
 *  bound, falling back to the scalar path otherwise. */
export function cosineSimilaritySimd(vec1, vec2) {
  _checkSameDim(vec1, vec2);
  if (_kernels) return _kernels.cosineSim(vec1.asArray(), vec2.asArray());
  return _cosineScalar(vec1.asArray(), vec2.asArray());
}
