#!/usr/bin/env node
/**
 * Filtered search via the Node SDK (twin of examples/search_filter.py and
 * of reference examples/test_search_filter.rs).
 *
 * Start the serving process first:
 *   VECTOR_DB_PORT=7533 STORAGE_MODE=mock python -m fabstir_vectordb_tpu.api.server
 * Then:  node examples/search_filter.mjs
 */
import { VectorDBSession } from "../bindings/node/index.mjs";

const DIM = 128;
const vec = (i) =>
  Array.from({ length: DIM }, (_, j) => Math.sin(i + j) * 0.5);

const session = await VectorDBSession.create({
  sessionId: "example-filter",
  serverUrl: process.env.SERVER_URL || "http://localhost:7533",
});

await session.addVectors([
  { id: "vec-0", vector: vec(0), metadata: {
      category: "technology", published: true, views: 1500,
      tags: ["ai", "ml"], author: { name: "alice", karma: 90 } } },
  { id: "vec-1", vector: vec(1), metadata: {
      category: "technology", published: false, views: 300,
      tags: ["db"], author: { name: "bob", karma: 40 } } },
  { id: "vec-2", vector: vec(2), metadata: {
      category: "science", published: true, views: 5200,
      tags: ["physics", "ai"], author: { name: "carol", karma: 75 } } },
  { id: "vec-3", vector: vec(3), metadata: {
      category: "sports", published: true, views: 800,
      tags: ["football"], author: { name: "dave", karma: 10 } } },
  { id: "vec-4", vector: vec(4), metadata: {
      category: "science", published: false, views: 40,
      tags: ["chemistry"], author: { name: "erin", karma: 55 } } },
]);

async function run(label, filter, expect) {
  const hits = await session.search(vec(0), 5, { filter });
  const got = hits.map((h) => h.id).sort();
  const want = [...expect].sort();
  const ok = JSON.stringify(got) === JSON.stringify(want);
  console.log(`  ${label} -> ${got} [${ok ? "ok" : `MISMATCH want ${want}`}]`);
  if (!ok) throw new Error(label);
}

console.log("equality / implicit AND:");
await run('{category: "technology"}', { category: "technology" },
          ["vec-0", "vec-1"]);

console.log("$in:");
await run('{category: {$in: [sports, science]}}',
          { category: { $in: ["sports", "science"] } },
          ["vec-2", "vec-3", "vec-4"]);

console.log("ranges:");
await run('{views: {$gt: 40, $lt: 1500}}',
          { views: { $gt: 40, $lt: 1500 } }, ["vec-1", "vec-3"]);

console.log("combinators:");
await run('{$and: [{published: true}, {views: {$gte: 1000}}]}',
          { $and: [{ published: true }, { views: { $gte: 1000 } }] },
          ["vec-0", "vec-2"]);
await run('{$or: [{category: sports}, {views: {$lt: 100}}]}',
          { $or: [{ category: "sports" }, { views: { $lt: 100 } }] },
          ["vec-3", "vec-4"]);

console.log("dot path + array contains:");
await run('{"author.karma": {$gte: 70}}',
          { "author.karma": { $gte: 70 } }, ["vec-0", "vec-2"]);
await run('{tags: "ai"}', { tags: "ai" }, ["vec-0", "vec-2"]);

await session.destroy();
console.log("OK — filter grammar complete");
