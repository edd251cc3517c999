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
console.log("fvdb_kernels.wasm smoke: OK");
