/**
 * Type declarations for the fabstir-vectordb-tpu REST client
 * (./client.mjs). Contract parity with the reference TypeScript client
 * (reference: bindings/js/src/{client,types}.ts).
 */

export type Metadata = unknown;
export type MetadataFilter = Record<string, unknown>;

export interface ClientOptions {
  /** Server origin (default: "http://localhost:8080"). */
  baseUrl?: string;
  /** Per-request timeout in milliseconds (default: 30000). */
  timeoutMs?: number;
  /** Retries on 5xx/network errors (default: 3, exp backoff ≤ 10 s). */
  maxRetries?: number;
  /** Called before each retry with (attempt, error). */
  onRetry?: (attempt: number, err: Error) => void;
}

export interface SearchOptions {
  filter?: MetadataFilter;
  scoreThreshold?: number;
  includeVectors?: boolean;
}

export interface SearchResult {
  id: string;
  /** Similarity score = 1 / (1 + distance). */
  score: number;
  metadata: Metadata;
  vector?: number[];
}

export interface HealthResponse {
  status: string;
  version: string;
  storage_mode: string;
  stats: unknown;
}

export declare class VectorDbError extends Error {
  constructor(message: string, code?: string, status?: number | null);
  code: string;
  /** HTTP status, or null for network/timeout failures. */
  status: number | null;
}

export declare class VectorDbClient {
  constructor(opts?: ClientOptions);
  baseUrl: string;

  health(): Promise<HealthResponse>;
  insert(id: string, vector: number[], metadata?: Metadata): Promise<unknown>;
  insertBatch(
    vectors: Array<{ id: string; vector: number[]; metadata?: Metadata }>,
  ): Promise<{ inserted: number; failed: number; errors: unknown[] }>;
  get(id: string): Promise<{ id: string; vector: number[]; metadata: Metadata }>;
  delete(id: string): Promise<unknown>;
  /** delete-then-insert upsert (matches the reference client's update). */
  update(id: string, vector: number[], metadata?: Metadata): Promise<unknown>;
  search(
    vector: number[],
    k?: number,
    options?: SearchOptions,
  ): Promise<SearchResult[]>;
  statistics(): Promise<unknown>;
  migrate(): Promise<unknown>;
  rebalance(): Promise<unknown>;
  backup(): Promise<unknown>;
  /** SSE mutation feed; returns an unsubscribe function. */
  subscribeUpdates(onUpdate: (event: unknown) => void): () => void;
}

export declare class SearchBuilder {
  constructor(client: VectorDbClient, vector: number[]);
  k(k: number): this;
  filter(f: MetadataFilter): this;
  scoreThreshold(t: number): this;
  includeVectors(v?: boolean): this;
  execute(): Promise<SearchResult[]>;
}
