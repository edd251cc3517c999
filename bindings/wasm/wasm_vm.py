"""Minimal WebAssembly interpreter — CI validator for the shipped .wasm.

The build image has no browser, Node, or wasm runtime, so the committed
``fvdb_kernels.wasm`` artifact is executed HERE: a small, spec-conformant
(for the MVP subset the module uses) stack-machine interpreter. The test
suite instantiates the artifact through this VM and compares every export
against numpy references — the artifact is pinned by execution, not just
by checksum.

Supported subset (everything gen_kernels.py emits):
  - sections: type, function, memory, global, export, code
  - control: block/loop/if/else/end, br, br_if, return, call
  - locals/globals, i32/f32 const + arithmetic/compare, shifts, and/or
  - i32/f32 load/store, memory.size, memory.grow, drop, select

Traps (out-of-bounds access, stack type confusion) raise WasmTrap.
"""
from __future__ import annotations

import struct

PAGE = 65536


class WasmTrap(RuntimeError):
    pass


def _uleb(buf: bytes, i: int):
    shift = result = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _sleb(buf: bytes, i: int):
    shift = result = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            if b & 0x40:
                result |= -(1 << shift)
            return result, i


def _i32(v: int) -> int:
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v & 0x80000000 else v


def _f32(x: float) -> float:
    return struct.unpack("<f", struct.pack("<f", x))[0]


class _Fn:
    __slots__ = ("params", "results", "locals", "code")

    def __init__(self, params, results, locals_, code):
        self.params, self.results = params, results
        self.locals, self.code = locals_, code


class Module:
    def __init__(self, data: bytes):
        try:
            self._parse(data)
        except WasmTrap:
            raise
        except Exception as e:  # noqa: BLE001 - malformed binary, any shape
            # fuzz contract: a corrupt module must surface as WasmTrap,
            # never as a raw IndexError/struct.error/UnicodeDecodeError
            # from parser internals (tests/unit/test_wasm_kernels.py
            # mutates the committed artifact and asserts this)
            raise WasmTrap(f"malformed module: {type(e).__name__}: {e}") from e

    def _parse(self, data: bytes):
        if data[:8] != b"\x00asm\x01\x00\x00\x00":
            raise WasmTrap("bad magic/version")
        self.types: list = []
        self.func_types: list = []
        self.globals: list = []
        self.exports: dict = {}
        self.funcs: list = []
        mem_min = 0
        i = 8
        bodies_raw = []
        while i < len(data):
            sid = data[i]
            i += 1
            size, i = _uleb(data, i)
            end = i + size
            if end > len(data):
                raise WasmTrap(
                    f"section {sid} promises {size} bytes past EOF")
            if sid == 1:  # types
                cnt, i = _uleb(data, i)
                for _ in range(cnt):
                    assert data[i] == 0x60
                    i += 1
                    np_, i = _uleb(data, i)
                    params = list(data[i:i + np_]); i += np_
                    nr, i = _uleb(data, i)
                    results = list(data[i:i + nr]); i += nr
                    self.types.append((params, results))
            elif sid == 3:  # function -> type indices
                cnt, i = _uleb(data, i)
                for _ in range(cnt):
                    t, i = _uleb(data, i)
                    self.func_types.append(t)
            elif sid == 5:  # memory
                cnt, i = _uleb(data, i)
                for _ in range(cnt):
                    flags, i = _uleb(data, i)
                    mem_min, i = _uleb(data, i)
                    if flags & 1:
                        _max, i = _uleb(data, i)
            elif sid == 6:  # globals
                cnt, i = _uleb(data, i)
                for _ in range(cnt):
                    vt = data[i]; i += 1
                    _mut = data[i]; i += 1
                    op = data[i]; i += 1
                    if op == 0x41:
                        v, i = _sleb(data, i)
                    elif op == 0x43:
                        v = struct.unpack("<f", data[i:i + 4])[0]; i += 4
                    else:
                        raise WasmTrap(f"unsupported global init 0x{op:x}")
                    assert data[i] == 0x0B
                    i += 1
                    self.globals.append([vt, v])
            elif sid == 7:  # exports
                cnt, i = _uleb(data, i)
                for _ in range(cnt):
                    ln, i = _uleb(data, i)
                    name = data[i:i + ln].decode(); i += ln
                    kind = data[i]; i += 1
                    idx, i = _uleb(data, i)
                    self.exports[name] = (kind, idx)
            elif sid == 10:  # code
                cnt, i = _uleb(data, i)
                for _ in range(cnt):
                    bsz, i = _uleb(data, i)
                    bodies_raw.append(data[i:i + bsz])
                    i += bsz
            i = end
        for ti, raw in zip(self.func_types, bodies_raw):
            params, results = self.types[ti]
            j = 0
            ngroups, j = _uleb(raw, j)
            locs = []
            for _ in range(ngroups):
                n, j = _uleb(raw, j)
                vt = raw[j]; j += 1
                locs += [vt] * n
            self.funcs.append(_Fn(params, results, locs, raw[j:]))
        self.memory = bytearray(mem_min * PAGE)


class _Br(Exception):
    def __init__(self, depth):
        self.depth = depth


class _Ret(Exception):
    def __init__(self, vals):
        self.vals = vals


class Instance:
    """Instantiated module; call exports via ``inst.call('name', *args)``
    and read/write memory via the f32/i32 helpers."""

    def __init__(self, module: Module, fuel: int | None = None):
        self.m = module
        self._blocks_cache: dict = {}
        # optional instruction budget: mutated binaries can flip a loop
        # exit into an infinite loop — with fuel set, execution traps
        # instead of hanging (used by the fuzz tests)
        self.fuel = fuel

    # --------------------------------------------------------------- memory
    def mem_write_f32(self, ptr: int, values) -> None:
        b = struct.pack(f"<{len(values)}f", *values)
        self.m.memory[ptr:ptr + len(b)] = b

    def mem_read_f32(self, ptr: int, n: int):
        return list(struct.unpack(f"<{n}f", bytes(self.m.memory[ptr:ptr + 4 * n])))

    def mem_read_i32(self, ptr: int, n: int):
        return list(struct.unpack(f"<{n}i", bytes(self.m.memory[ptr:ptr + 4 * n])))

    # ---------------------------------------------------------------- calls
    def call(self, name: str, *args):
        try:
            kind, idx = self.m.exports[name]
        except KeyError:
            raise WasmTrap(f"no export named {name!r}") from None
        if kind != 0:
            raise WasmTrap(f"{name} is not a function export")
        return self._invoke(idx, list(args))

    def _invoke(self, fidx: int, args: list):
        try:
            fn = self.m.funcs[fidx]
        except IndexError:
            raise WasmTrap(f"no function index {fidx}") from None
        if len(args) != len(fn.params):
            raise WasmTrap("arity mismatch")
        locals_ = list(args) + [
            0.0 if vt == 0x7D else 0 for vt in fn.locals]
        stack: list = []
        try:
            self._exec(fn.code, 0, len(fn.code), locals_, stack, [])
        except _Ret as r:
            return r.vals[-1] if r.vals else None
        except _Br as br:
            # a br escaping the function body is malformed in our subset —
            # and it must NOT bubble into a CALLER's block bookkeeping
            raise WasmTrap(f"br depth {br.depth} escapes function") from None
        except WasmTrap:
            raise
        except Exception as e:  # noqa: BLE001 - corrupt bytecode, any shape
            # same fuzz contract as module parsing: execution of mutated
            # bytecode traps, it doesn't leak interpreter internals
            raise WasmTrap(f"execution fault: {type(e).__name__}: {e}") from e
        if fn.results:
            if not stack:
                raise WasmTrap("function body left an empty stack")
            return stack[-1]
        return None

    # ------------------------------------------------- structured execution
    def _block_ends(self, code: bytes):
        """Map every block/loop/if start -> (else_pos or None, end_pos)."""
        key = id(code)
        cached = self._blocks_cache.get(key)
        if cached is not None:
            return cached
        out = {}
        stack = []
        i = 0
        n = len(code)
        while i < n:
            op = code[i]
            if op in (0x02, 0x03, 0x04):
                stack.append([i, None])
                i += 2  # opcode + blocktype byte
            elif op == 0x05:  # else
                stack[-1][1] = i
                i += 1
            elif op == 0x0B:  # end
                if stack:
                    start, else_pos = stack.pop()
                    out[start] = (else_pos, i)
                i += 1
            else:
                i = self._skip(code, i)
        self._blocks_cache[key] = out
        return out

    def _skip(self, code: bytes, i: int) -> int:
        """Advance past one non-structured instruction."""
        op = code[i]
        i += 1
        if op in (0x0C, 0x0D, 0x10, 0x20, 0x21, 0x22, 0x23, 0x24):
            _, i = _uleb(code, i)
        elif op == 0x41:
            _, i = _sleb(code, i)
        elif op == 0x43:
            i += 4
        elif op in (0x28, 0x2A, 0x36, 0x38):
            _, i = _uleb(code, i)
            _, i = _uleb(code, i)
        elif op in (0x3F, 0x40):
            i += 1
        return i

    def _exec(self, code, i, end, locals_, stack, labels):
        mem = self.m.memory
        blocks = self._block_ends(code)
        while i < end:
            if self.fuel is not None:
                self.fuel -= 1
                if self.fuel < 0:
                    raise WasmTrap("out of fuel")
            op = code[i]
            if op == 0x02 or op == 0x03:  # block / loop
                _else, bend = blocks[i]
                is_loop = op == 0x03
                while True:
                    try:
                        self._exec(code, i + 2, bend, locals_, stack,
                                   labels + [("loop" if is_loop else "block", i)])
                        break
                    except _Br as br:
                        if br.depth > 0:
                            raise _Br(br.depth - 1)
                        if is_loop:
                            continue  # br to a loop label = continue
                        break  # br to a block label = exit
                i = bend + 1
            elif op == 0x04:  # if
                else_pos, bend = blocks[i]
                cond = stack.pop()
                if cond:
                    lo, hi = i + 2, (else_pos if else_pos is not None else bend)
                else:
                    lo, hi = ((else_pos + 1, bend) if else_pos is not None
                              else (bend, bend))
                try:
                    self._exec(code, lo, hi, locals_, stack,
                               labels + [("block", i)])
                except _Br as br:
                    if br.depth > 0:
                        raise _Br(br.depth - 1)
                i = bend + 1
            elif op == 0x0B:  # stray end inside slice (shouldn't happen)
                i += 1
            elif op == 0x0C:  # br
                d, _ = _uleb(code, i + 1)
                raise _Br(d)
            elif op == 0x0D:  # br_if
                d, j = _uleb(code, i + 1)
                if stack.pop():
                    raise _Br(d)
                i = j
            elif op == 0x0F:  # return
                raise _Ret(stack[:])
            elif op == 0x10:  # call
                fidx, j = _uleb(code, i + 1)
                fn = self.m.funcs[fidx]
                args = [stack.pop() for _ in fn.params][::-1]
                r = self._invoke(fidx, args)
                if fn.results:
                    stack.append(r)
                i = j
            elif op == 0x1A:  # drop
                stack.pop(); i += 1
            elif op == 0x1B:  # select
                c = stack.pop(); b = stack.pop(); a = stack.pop()
                stack.append(a if c else b); i += 1
            elif op == 0x20:
                li, i = _uleb(code, i + 1); stack.append(locals_[li])
            elif op == 0x21:
                li, i = _uleb(code, i + 1); locals_[li] = stack.pop()
            elif op == 0x22:
                li, i = _uleb(code, i + 1); locals_[li] = stack[-1]
            elif op == 0x23:
                gi, i = _uleb(code, i + 1)
                stack.append(self.m.globals[gi][1])
            elif op == 0x24:
                gi, i = _uleb(code, i + 1)
                self.m.globals[gi][1] = stack.pop()
            elif op in (0x28, 0x2A):  # i32.load / f32.load
                _a, j = _uleb(code, i + 1)
                off, j = _uleb(code, j)
                addr = _i32(stack.pop()) + off
                if addr < 0 or addr + 4 > len(mem):
                    raise WasmTrap(f"oob load at {addr}")
                raw = bytes(mem[addr:addr + 4])
                stack.append(struct.unpack("<i" if op == 0x28 else "<f", raw)[0])
                i = j
            elif op in (0x36, 0x38):  # i32.store / f32.store
                _a, j = _uleb(code, i + 1)
                off, j = _uleb(code, j)
                val = stack.pop()
                addr = _i32(stack.pop()) + off
                if addr < 0 or addr + 4 > len(mem):
                    raise WasmTrap(f"oob store at {addr}")
                mem[addr:addr + 4] = struct.pack(
                    "<i" if op == 0x36 else "<f",
                    _i32(val) if op == 0x36 else val)
                i = j
            elif op == 0x3F:  # memory.size
                stack.append(len(mem) // PAGE); i += 2
            elif op == 0x40:  # memory.grow
                delta = stack.pop()
                old = len(mem) // PAGE
                # spec behavior on failure is returning -1; cap at 4096
                # pages (256 MB) so a fuzzed grow can't exhaust host RAM
                if delta < 0 or old + delta > 4096:
                    stack.append(-1)
                else:
                    mem.extend(bytes(delta * PAGE))
                    self.m.memory = mem = mem  # same object, extended
                    stack.append(old)
                i += 2
            elif op == 0x41:
                v, i = _sleb(code, i + 1); stack.append(_i32(v))
            elif op == 0x43:
                stack.append(struct.unpack("<f", code[i + 1:i + 5])[0])
                i += 5
            elif op == 0x45:  # i32.eqz
                stack.append(int(stack.pop() == 0)); i += 1
            elif op in (0x46, 0x47, 0x48, 0x4A, 0x4C, 0x4E):
                b = _i32(stack.pop()); a = _i32(stack.pop())
                stack.append(int({
                    0x46: a == b, 0x47: a != b, 0x48: a < b,
                    0x4A: a > b, 0x4C: a <= b, 0x4E: a >= b,
                }[op])); i += 1
            elif op in (0x5B, 0x5C, 0x5D, 0x5E, 0x5F, 0x60):
                b = stack.pop(); a = stack.pop()
                stack.append(int({
                    0x5B: a == b, 0x5C: a != b, 0x5D: a < b,
                    0x5E: a > b, 0x5F: a <= b, 0x60: a >= b,
                }[op])); i += 1
            elif op in (0x6A, 0x6B, 0x6C, 0x71, 0x72, 0x74, 0x75, 0x76):
                b = _i32(stack.pop()); a = _i32(stack.pop())
                if op == 0x6A: r = a + b
                elif op == 0x6B: r = a - b
                elif op == 0x6C: r = a * b
                elif op == 0x71: r = a & b
                elif op == 0x72: r = a | b
                elif op == 0x74: r = a << (b & 31)
                elif op == 0x75: r = a >> (b & 31)
                else: r = (a & 0xFFFFFFFF) >> (b & 31)
                stack.append(_i32(r)); i += 1
            elif op == 0x91:  # f32.sqrt
                stack.append(_f32(stack.pop() ** 0.5)); i += 1
            elif op in (0x92, 0x93, 0x94, 0x95, 0x96, 0x97):
                b = stack.pop(); a = stack.pop()
                if op == 0x92: r = a + b
                elif op == 0x93: r = a - b
                elif op == 0x94: r = a * b
                elif op == 0x95: r = a / b if b != 0 else float(
                    "inf" if a > 0 else "-inf" if a < 0 else "nan")
                elif op == 0x96: r = min(a, b)
                else: r = max(a, b)
                stack.append(_f32(r)); i += 1  # f32 rounding after every op
            else:
                raise WasmTrap(f"unsupported opcode 0x{op:02x} at {i}")
        return


def instantiate(data: bytes, fuel: int | None = None) -> Instance:
    return Instance(Module(data), fuel=fuel)
