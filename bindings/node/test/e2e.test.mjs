/**
 * Node SDK e2e: full session lifecycle against a live serving process
 * (mirrors the reference's primary SDK e2e suite, reference:
 * bindings/node/test/e2e-chunked.test.js:60-80 add->save->load->search->
 * destroy, e2e-crud, vacuum, update-metadata, delete-by-metadata,
 * schema-validation, session-config flows).
 *
 * Run from the repo root with: node --test bindings/node/test/
 * (requires Node >= 18 and the Python package on cwd).
 */
import assert from "node:assert/strict";
import { after, before, test } from "node:test";

import { VectorDBSession, VectorDBError } from "../index.mjs";
import { startServer } from "./helpers/start-server.mjs";

const DIM = 8;
let server;

function vec(seedRow) {
  // deterministic unit-ish vectors, distinct per row
  const v = new Array(DIM).fill(0).map((_, j) =>
    Math.sin(seedRow * 37.1 + j * 11.7));
  return v;
}

before(async () => {
  server = await startServer({ port: 7914, dimension: DIM });
});
after(() => server?.stop());

test("session config validation", async () => {
  await assert.rejects(VectorDBSession.create({}),
    (e) => e instanceof VectorDBError && e.code === "INVALID_CONFIG");
  await assert.rejects(
    VectorDBSession.create({ sessionId: "x", chunkSize: 0 }),
    (e) => e.code === "INVALID_CONFIG");
  await assert.rejects(
    VectorDBSession.create({ sessionId: "x", cacheSizeMb: -1 }),
    (e) => e.code === "INVALID_CONFIG");
});

test("e2e: add -> search -> crud -> save -> load -> vacuum -> destroy", async () => {
  const session = await VectorDBSession.create({
    sessionId: "node-e2e",
    serverUrl: server.base,
  });

  // ---- ingest (first batch trains IVF like the reference: session.rs:365) ----
  const n = 200;
  const vectors = [];
  for (let i = 0; i < n; i++) {
    vectors.push({ id: `v${i}`, vector: vec(i),
                   metadata: { idx: i, cat: i % 2 === 0 ? "even" : "odd",
                               tags: [`mod${i % 5}`, "all"] } });
  }
  const inserted = await session.addVectors(vectors);
  assert.equal(inserted, n);

  // ---- search: score = 1/(1+d), originalId round-trips ----
  let results = await session.search(vec(17), 3);
  assert.equal(results[0].id, "v17");
  assert.ok(Math.abs(results[0].score - 1.0) < 1e-6);
  assert.equal(results[0].metadata.idx, 17);

  // includeVectors
  results = await session.search(vec(17), 1, { includeVectors: true });
  assert.equal(results[0].vector.length, DIM);

  // threshold
  results = await session.search(vec(17), 5, { threshold: 0.999 });
  assert.ok(results.every((r) => r.score >= 0.999));

  // ---- filtered search (MongoDB-style operators) ----
  results = await session.search(vec(16), 4, { filter: { cat: "even" } });
  assert.ok(results.length > 0);
  assert.ok(results.every((r) => r.metadata.cat === "even"));

  results = await session.search(vec(16), 4,
    { filter: { idx: { $gte: 10, $lt: 20 } } });
  assert.ok(results.every((r) => r.metadata.idx >= 10 && r.metadata.idx < 20));

  results = await session.search(vec(15), 4, { filter: { tags: "mod0" } });
  assert.ok(results.every((r) => r.metadata.idx % 5 === 0));

  results = await session.search(vec(16), 4,
    { filter: { $or: [{ idx: 16 }, { idx: 17 }] } });
  assert.deepEqual(results.map((r) => r.id).sort(), ["v16", "v17"]);

  // invalid filter -> INVALID_INPUT
  await assert.rejects(
    session.search(vec(0), 1, { filter: { idx: { $gte: 1, $gt: 2 } } }),
    (e) => e.code === "INVALID_INPUT");

  // ---- getVector / updateMetadata / deleteVector ----
  const got = await session.getVector("v3");
  assert.equal(got.id, "v3");
  assert.equal(got.metadata.idx, 3);

  await session.updateMetadata("v3", { idx: 3, cat: "patched" });
  const updated = await session.getVector("v3");
  assert.equal(updated.metadata.cat, "patched");

  await session.deleteVector("v4");
  await assert.rejects(session.getVector("v4"));
  results = await session.search(vec(4), 1);
  assert.notEqual(results[0].id, "v4");

  // ---- deleteByMetadata ----
  const del = await session.deleteByMetadata({ cat: "odd" });
  assert.equal(del.deletedCount, 99); // v3 was re-labeled "patched"
  results = await session.search(vec(9), 5);
  assert.ok(results.every((r) => r.metadata.cat !== "odd"));

  // ---- stats ----
  const stats = await session.getStats();
  assert.equal(typeof stats.vectorCount, "number");
  assert.equal(stats.totalDeletedCount, 100); // 99 odd + v4

  // ---- save / vacuum / load ----
  const cid = await session.saveToS5();
  assert.ok(cid);

  const vac = await session.vacuum();
  assert.equal(vac.totalRemoved, 100);

  const loaded = await session.loadUserVectors(cid, { lazyLoad: false });
  assert.ok(loaded >= 99);
  results = await session.search(vec(16), 1);
  assert.equal(results[0].id, "v16");

  await session.destroy();
  await assert.rejects(session.search(vec(0), 1),
    (e) => e.code === "SESSION_ERROR");
});

test("schema validation rejects bad metadata", async () => {
  const session = await VectorDBSession.create({
    sessionId: "node-schema",
    serverUrl: server.base,
  });
  await session.setSchema({
    fields: { title: { type: "string" } },
    required: ["title"],
  });
  await assert.rejects(
    session.addVectors([{ id: "bad", vector: vec(1), metadata: { nope: 1 } }]),
    (e) => e.code === "INVALID_INPUT" || e.code === "INVALID_DATA");
  await session.addVectors(
    [{ id: "ok", vector: vec(2), metadata: { title: "fine" } }]);
  await session.setSchema(null); // clear for other tests
});
