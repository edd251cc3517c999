/**
 * JS REST client unit tests: retry/backoff, error shaping, SSE subscription
 * (mirrors the reference TS client's interceptor-retry and EventSource tests,
 * reference: bindings/js/src/client.ts:46-72,130-160).
 *
 * Self-contained: drives the client against an in-process node:http mock —
 * no Python server needed. Run: node --test bindings/js/test/
 */
import assert from "node:assert/strict";
import http from "node:http";
import { after, before, test } from "node:test";

import { VectorDbClient, VectorDbError } from "../client.mjs";

let server;
let base;
let state;

before(async () => {
  state = { failuresLeft: 0, hits: 0 };
  server = http.createServer((req, res) => {
    state.hits += 1;
    if (req.url.endsWith("/flaky")) {
      if (state.failuresLeft > 0) {
        state.failuresLeft -= 1;
        res.writeHead(503).end();
        return;
      }
      res.writeHead(200, { "Content-Type": "application/json" });
      res.end(JSON.stringify({ ok: true, after: state.hits }));
      return;
    }
    if (req.url.endsWith("/health")) {
      res.writeHead(200, { "Content-Type": "application/json" });
      res.end(JSON.stringify({ status: "healthy" }));
      return;
    }
    if (req.url.endsWith("/bad")) {
      res.writeHead(400, { "Content-Type": "application/json" });
      res.end(JSON.stringify(
        { error: { message: "nope", code: "INVALID_INPUT" } }));
      return;
    }
    if (req.url.endsWith("/stream/updates")) {
      res.writeHead(200, { "Content-Type": "text/event-stream" });
      res.write('data: {"type":"insert","id":"a"}\n\n');
      res.write('data: {"type":"delete","id":"b"}\n\n');
      // leave open; client unsubscribes
      return;
    }
    res.writeHead(404).end();
  });
  await new Promise((res) => server.listen(0, res));
  base = `http://localhost:${server.address().port}`;
});
after(() => server.close());

test("retries 5xx with backoff and onRetry hook", async () => {
  state.failuresLeft = 2;
  const retries = [];
  const client = new VectorDbClient({
    baseUrl: base,
    maxRetries: 3,
    onRetry: (attempt, err) => retries.push(attempt),
  });
  const out = await client._request("GET", "/flaky");
  assert.equal(out.ok, true);
  assert.deepEqual(retries, [1, 2]); // two failures -> two retry callbacks
});

test("gives up after maxRetries", async () => {
  state.failuresLeft = 99;
  const client = new VectorDbClient({ baseUrl: base, maxRetries: 1 });
  await assert.rejects(client._request("GET", "/flaky"),
    (e) => e instanceof VectorDbError && e.code === "NETWORK_ERROR");
});

test("4xx errors surface server code without retrying", async () => {
  const before4xx = state.hits;
  const client = new VectorDbClient({ baseUrl: base, maxRetries: 3 });
  await assert.rejects(client._request("GET", "/bad"),
    (e) => e.code === "INVALID_INPUT" && e.status === 400);
  assert.equal(state.hits, before4xx + 1); // exactly one attempt
});

test("health round-trips", async () => {
  const client = new VectorDbClient({ baseUrl: base });
  const h = await client.health();
  assert.equal(h.status, "healthy");
});

test("SSE subscription delivers parsed events", async () => {
  const client = new VectorDbClient({ baseUrl: base });
  const events = [];
  const unsubscribe = client.subscribeUpdates((e) => events.push(e));
  const deadline = Date.now() + 5000;
  while (events.length < 2 && Date.now() < deadline) {
    await new Promise((r) => setTimeout(r, 50));
  }
  unsubscribe();
  assert.equal(events.length >= 2, true);
  assert.equal(events[0].type, "insert");
  assert.equal(events[1].id, "b");
});
