#!/usr/bin/env node
/**
 * Deletion lifecycle via the Node SDK (twin of examples/deletion.py and
 * of reference examples/test_deletion.rs, driven through the primary SDK).
 *
 * Start the serving process first:
 *   VECTOR_DB_PORT=7533 STORAGE_MODE=mock python -m fabstir_vectordb_tpu.api.server
 * Then:  node examples/deletion.mjs
 */
import { VectorDBSession } from "../bindings/node/index.mjs";

const DIM = 64;
const vec = (i) =>
  Array.from({ length: DIM }, (_, j) => Math.sin(i + j) * 0.5);

const session = await VectorDBSession.create({
  sessionId: "example-deletion",
  serverUrl: process.env.SERVER_URL || "http://localhost:7533",
});

console.log("inserting 20 vectors...");
await session.addVectors(
  Array.from({ length: 20 }, (_, i) => ({
    id: `doc${i}`,
    vector: vec(i),
    metadata: { group: i % 2 === 0 ? "even" : "odd", n: i },
  })),
);

console.log("deleting doc3 and doc8...");
await session.deleteVector("doc3");
await session.deleteVector("doc8");

console.log("delete-by-metadata {group: 'odd', n: {$gte: 15}}...");
const del = await session.deleteByMetadata({ group: "odd", n: { $gte: 15 } });
console.log(`  deleted ${del.deletedCount}: ${del.deletedIds.sort()}`);

const hits = await session.search(vec(3), 5);
if (hits.some((h) => h.id === "doc3")) {
  throw new Error("deleted doc3 still searchable");
}
console.log(`top-5 near doc3 (doc3 absent): ${hits.map((h) => h.id)}`);

let stats = await session.getStats();
console.log(`before vacuum: ${stats.vectorCount} active, ` +
            `${stats.totalDeletedCount} deleted`);

const vac = await session.vacuum();
console.log(`vacuum removed ${vac.totalRemoved}`);
stats = await session.getStats();
console.log(`after vacuum: ${stats.vectorCount} active, ` +
            `${stats.totalDeletedCount} deleted`);

await session.destroy();
console.log("OK — deletion lifecycle complete");
