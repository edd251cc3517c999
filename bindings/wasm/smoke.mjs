// Node smoke test for the committed WASM artifacts (run by
// scripts/run_node_tests.sh when a Node runtime exists).
import { readFile } from "node:fs/promises";
import { fileURLToPath } from "node:url";
import { dirname, join } from "node:path";
import assert from "node:assert";

import { FvdbKernels } from "./kernels.mjs";

const here = dirname(fileURLToPath(import.meta.url));
const bytes = await readFile(join(here, "fvdb_kernels.wasm"));
const kx = await FvdbKernels.load(bytes);

const a = new Float32Array([1, 0, 0, 0]);
const b = new Float32Array([0, 1, 0, 0]);
assert(Math.abs(kx.l2Sq(a, b) - 2) < 1e-6, "l2Sq");
assert(Math.abs(kx.dot(a, a) - 1) < 1e-6, "dot");
assert(Math.abs(kx.cosineSim(a, b)) < 1e-6, "cosineSim");

const n = 100, dim = 8, k = 3;
const vecs = new Float32Array(n * dim);
for (let i = 0; i < vecs.length; i++) vecs[i] = Math.sin(i * 0.37);
const q = vecs.slice(42 * dim, 43 * dim); // exact row 42
const { indices, distances } = kx.topkL2(vecs, n, dim, q, k);
assert(indices[0] === 42, `self-hit expected 42, got ${indices[0]}`);
assert(distances[0] < 1e-6, "self distance ~0");
for (let i = 1; i < distances.length; i++) {
  assert(distances[i - 1] <= distances[i], "ascending");
}

// masked cosine scan (the browser InMemoryIndex kernel)
const occ = new Int32Array(n).fill(1);
occ[42] = 0; // mask the exact hit out
const cos = kx.topkCosine(vecs, occ, n, dim, q, k);
assert(cos.indices.length === k, "cosine count");
assert(!Array.from(cos.indices).includes(42), "masked slot excluded");
for (let i = 1; i < cos.distances.length; i++) {
  assert(cos.distances[i - 1] <= cos.distances[i], "cosine ascending");
}

// full browser index surface on the same artifact
const { InMemoryIndex, SearchFilter } = await import("./kernels-index.mjs");
const ix = await InMemoryIndex.create(4, bytes);
ix.addVector("a", [1, 0, 0, 0], { genre: "jazz" });
ix.addVector("b", [0, 1, 0, 0], { genre: "rock" });
ix.addVector("c", [0.9, 0.1, 0, 0], { genre: "jazz" });
const hits = ix.search([1, 0, 0, 0], 2);
assert(hits[0].id === "a" && hits[1].id === "c", "index search order");
const f = new SearchFilter().addStringFilter("genre", "rock");
const fh = ix.searchWithFilter([1, 0, 0, 0], 2, f);
assert(fh.length === 1 && fh[0].id === "b", "filtered search");
ix.deleteVector("a");
assert(ix.size() === 2, "delete");
const ix2 = await InMemoryIndex.deserialize(ix.serialize(), bytes);
assert(ix2.size() === 2, "serialize roundtrip");

// vector helper surface (vector.rs parity) on the same artifact
const { Vector, VectorBatch, bindKernels, cosineSimilarity,
        cosineSimilaritySimd, euclideanDistance } =
  await import("./vector.mjs");
const v1 = new Vector([3, 4]), v2 = new Vector([4, 3]);
assert(Math.abs(v1.magnitude() - 5) < 1e-6, "magnitude");
assert(Math.abs(v1.normalize().magnitude() - 1) < 1e-6, "normalize");
assert(Math.abs(cosineSimilarity(v1, v2) - 24 / 25) < 1e-6, "cosine scalar");
bindKernels(kx); // accelerated paths now execute inside the artifact
assert(Math.abs(cosineSimilaritySimd(v1, v2) - 24 / 25) < 1e-5, "cosine wasm");
assert(Math.abs(euclideanDistance(v1, v2) - Math.SQRT2) < 1e-5, "euclid wasm");
const batch = new VectorBatch();
batch.addVector(v1); batch.addVector(new Vector([0, 0]));
const sims = batch.computeSimilarities(v1);
assert(Math.abs(sims[0] - 1) < 1e-5 && sims[1] === 0, "batch sims");
bindKernels(null);

console.log("fvdb_kernels.wasm smoke: OK");
