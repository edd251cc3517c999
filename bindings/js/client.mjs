/**
 * fabstir-vectordb-tpu REST client (JavaScript, ESM).
 *
 * Mirrors the reference TypeScript client (reference:
 * bindings/js/src/client.ts): typed wrapper over the /api/v1 REST API with
 * retry (exponential backoff capped at 10s + onRetry hook, client.ts:46-72)
 * and an EventSource-style update subscription over SSE (client.ts:130-160).
 * Uses global fetch (Node >= 18 / browsers); no dependencies.
 */

export class VectorDbError extends Error {
  constructor(message, code = "ERROR", status = null) {
    super(message);
    this.code = code;
    this.status = status;
  }
}

export class VectorDbClient {
  /**
   * @param {object} opts
   * @param {string} [opts.baseUrl]    server origin (default http://localhost:8080)
   * @param {number} [opts.timeoutMs]  per-request timeout
   * @param {number} [opts.maxRetries] retries on 5xx/network errors
   * @param {(attempt:number, err:Error)=>void} [opts.onRetry]
   */
  constructor(opts = {}) {
    this.baseUrl = (opts.baseUrl || "http://localhost:8080").replace(/\/$/, "") + "/api/v1";
    this.timeoutMs = opts.timeoutMs ?? 30000;
    this.maxRetries = opts.maxRetries ?? 3;
    this.onRetry = opts.onRetry || null;
  }

  async _request(method, path, body = null) {
    let lastErr = null;
    for (let attempt = 0; attempt <= this.maxRetries; attempt++) {
      try {
        const ctrl = new AbortController();
        const timer = setTimeout(() => ctrl.abort(), this.timeoutMs);
        const resp = await fetch(this.baseUrl + path, {
          method,
          headers: body != null ? { "Content-Type": "application/json" } : {},
          body: body != null ? JSON.stringify(body) : undefined,
          signal: ctrl.signal,
        });
        clearTimeout(timer);
        if (resp.status >= 500 && attempt < this.maxRetries) {
          throw new VectorDbError(`server error ${resp.status}`, "SERVER_ERROR", resp.status);
        }
        if (resp.status >= 400) {
          let msg = `HTTP ${resp.status}`;
          let code = "ERROR";
          try {
            const err = (await resp.json()).error || {};
            msg = err.message || msg;
            code = err.code || code;
          } catch {}
          throw Object.assign(new VectorDbError(msg, code, resp.status), { noRetry: true });
        }
        return await resp.json();
      } catch (err) {
        if (err.noRetry) throw err;
        lastErr = err;
        if (attempt < this.maxRetries) {
          const delay = Math.min(250 * 2 ** attempt, 10000);
          if (this.onRetry) this.onRetry(attempt + 1, err);
          await new Promise((r) => setTimeout(r, delay));
        }
      }
    }
    throw new VectorDbError(`request failed after retries: ${lastErr}`, "NETWORK_ERROR");
  }

  health() {
    return this._request("GET", "/health");
  }

  insert(id, vector, metadata = null) {
    return this._request("POST", "/vectors", { id, vector, metadata });
  }

  insertBatch(vectors) {
    return this._request("POST", "/vectors/batch", { vectors });
  }

  get(id) {
    return this._request("GET", `/vectors/${encodeURIComponent(id)}`);
  }

  delete(id) {
    return this._request("DELETE", `/vectors/${encodeURIComponent(id)}`);
  }

  async update(id, vector, metadata = null) {
    try {
      await this.delete(id);
    } catch {}
    return this.insert(id, vector, metadata);
  }

  /**
   * @param {number[]} vector
   * @param {number} k
   * @param {{filter?:object, scoreThreshold?:number, includeVectors?:boolean}} [options]
   */
  async search(vector, k = 10, options = {}) {
    const body = { vector, k };
    const opts = {};
    if (options.filter) opts.filter = options.filter;
    if (options.scoreThreshold != null) opts.score_threshold = options.scoreThreshold;
    if (options.includeVectors) opts.include_vectors = true;
    if (Object.keys(opts).length) body.options = opts;
    const out = await this._request("POST", "/search", body);
    return out.results;
  }

  statistics() {
    return this._request("GET", "/admin/statistics");
  }

  migrate() {
    return this._request("POST", "/admin/migrate");
  }

  rebalance() {
    return this._request("POST", "/admin/rebalance");
  }

  backup() {
    return this._request("POST", "/admin/backup");
  }

  /**
   * Subscribe to mutation events via SSE.
   * @param {(event:object)=>void} onUpdate
   * @returns {() => void} unsubscribe
   */
  subscribeUpdates(onUpdate) {
    const ctrl = new AbortController();
    (async () => {
      const resp = await fetch(this.baseUrl + "/stream/updates", { signal: ctrl.signal });
      const reader = resp.body.getReader();
      const decoder = new TextDecoder();
      let buf = "";
      for (;;) {
        const { done, value } = await reader.read();
        if (done) break;
        buf += decoder.decode(value, { stream: true });
        let idx;
        while ((idx = buf.indexOf("\n\n")) >= 0) {
          const frame = buf.slice(0, idx);
          buf = buf.slice(idx + 2);
          if (frame.startsWith("data: ")) {
            try {
              onUpdate(JSON.parse(frame.slice(6)));
            } catch {}
          }
        }
      }
    })().catch(() => {});
    return () => ctrl.abort();
  }
}

export class SearchBuilder {
  constructor(client, vector) {
    this._client = client;
    this._vector = vector;
    this._k = 10;
    this._options = {};
  }
  k(k) { this._k = k; return this; }
  filter(f) { this._options.filter = f; return this; }
  scoreThreshold(t) { this._options.scoreThreshold = t; return this; }
  includeVectors(v = true) { this._options.includeVectors = v; return this; }
  execute() { return this._client.search(this._vector, this._k, this._options); }
}
