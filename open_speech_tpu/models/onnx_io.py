"""Minimal ONNX protobuf I/O: read (and write) graph initializers.

The reference ships model weights as ONNX files (Silero VAD:
src/vad/silero.py:196-204, Piper voices: src/tts/backends/piper_backend.py:296)
and runs them with onnxruntime. The TPU build reimplements those graphs in
JAX and only needs the *weights*, so instead of depending on the full
``onnx``/``onnxruntime`` packages this module parses the protobuf wire
format directly and extracts ``graph.initializer`` tensors as numpy arrays.

A matching writer exists so tests can round-trip synthetic checkpoint files
without the onnx package installed.

Wire-format facts used (see the public onnx.proto3 schema):
  ModelProto.graph            = field 7  (GraphProto)
  GraphProto.initializer      = field 5  (repeated TensorProto)
  TensorProto.dims            = field 1  (repeated int64)
  TensorProto.data_type       = field 2  (enum)
  TensorProto.float_data      = field 4  (repeated float, packed)
  TensorProto.int32_data      = field 5
  TensorProto.int64_data      = field 7
  TensorProto.name            = field 8  (string)
  TensorProto.raw_data        = field 9  (bytes)
  TensorProto.double_data     = field 10
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

# TensorProto.DataType values → numpy dtypes
_DTYPES = {
    1: np.float32,
    2: np.uint8,
    3: np.int8,
    4: np.uint16,
    5: np.int16,
    6: np.int32,
    7: np.int64,
    9: np.bool_,
    10: np.float16,
    11: np.float64,
    12: np.uint32,
    13: np.uint64,
}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


# ── varint / wire primitives ───────────────────────────────────────────


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long (corrupt protobuf)")


def _write_varint(value: int) -> bytes:
    out = bytearray()
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def _iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one protobuf message.

    wire 0 → varint int; wire 1 → 8 raw bytes; wire 2 → bytes; wire 5 → 4
    raw bytes. Groups (3/4) are rejected — onnx never uses them.
    """
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val = buf[pos : pos + 8]
            pos += 8
        elif wire == 2:
            length, pos = _read_varint(buf, pos)
            val = buf[pos : pos + length]
            pos += length
        elif wire == 5:
            val = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wire}")
        yield field, wire, val


# ── TensorProto ────────────────────────────────────────────────────────


def _parse_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    dims: list[int] = []
    data_type = 1
    name = ""
    raw = b""
    f32: list[bytes] = []
    i32: list[int] = []
    i64: list[int] = []
    f64: list[bytes] = []
    for field, wire, val in _iter_fields(buf):
        if field == 1:  # dims: packed or repeated varint
            if wire == 0:
                dims.append(val)
            else:
                p = 0
                while p < len(val):
                    d, p = _read_varint(val, p)
                    dims.append(d)
        elif field == 2 and wire == 0:
            data_type = val
        elif field == 4:  # float_data
            f32.append(val if wire == 2 else val)
        elif field == 5:
            if wire == 0:
                i32.append(val)
            else:
                p = 0
                while p < len(val):
                    d, p = _read_varint(val, p)
                    i32.append(d)
        elif field == 7:
            if wire == 0:
                i64.append(val)
            else:
                p = 0
                while p < len(val):
                    d, p = _read_varint(val, p)
                    i64.append(d)
        elif field == 8 and wire == 2:
            name = val.decode("utf-8")
        elif field == 9 and wire == 2:
            raw = val
        elif field == 10:
            f64.append(val)
    np_dtype = _DTYPES.get(data_type)
    if np_dtype is None:
        raise ValueError(f"tensor {name!r}: unsupported data_type {data_type}")
    if raw:
        arr = np.frombuffer(raw, dtype=np_dtype)
    elif f32:
        arr = np.frombuffer(b"".join(f32), dtype=np.float32).astype(np_dtype)
    elif f64:
        arr = np.frombuffer(b"".join(f64), dtype=np.float64).astype(np_dtype)
    elif i64:
        arr = np.asarray(i64, dtype=np.int64).astype(np_dtype)
    elif i32:
        arr = np.asarray(i32, dtype=np.int32).astype(np_dtype)
    else:
        arr = np.zeros(0, dtype=np_dtype)
    return name, arr.reshape(dims) if dims else arr


def read_onnx_initializers(path: str | Path | bytes) -> dict[str, np.ndarray]:
    """All ``graph.initializer`` tensors of an ONNX model, name → array."""
    data = path if isinstance(path, bytes) else Path(path).read_bytes()
    out: dict[str, np.ndarray] = {}
    for field, wire, val in _iter_fields(data):  # ModelProto
        if field == 7 and wire == 2:  # graph
            for gfield, gwire, gval in _iter_fields(val):  # GraphProto
                if gfield == 5 and gwire == 2:  # initializer
                    name, arr = _parse_tensor(gval)
                    out[name] = arr
    return out


# ── writer (tests / tooling) ───────────────────────────────────────────


def _field(number: int, wire: int, payload: bytes) -> bytes:
    return _write_varint((number << 3) | wire) + (
        _write_varint(len(payload)) + payload if wire == 2 else payload
    )


def _encode_tensor(name: str, arr: np.ndarray) -> bytes:
    code = _DTYPE_CODES.get(arr.dtype)
    if code is None:
        raise ValueError(f"unsupported dtype {arr.dtype} for {name!r}")
    msg = b""
    for d in arr.shape:
        msg += _field(1, 0, _write_varint(int(d)))
    msg += _field(2, 0, _write_varint(code))
    msg += _field(8, 2, name.encode("utf-8"))
    msg += _field(9, 2, np.ascontiguousarray(arr).tobytes())
    return msg


def write_onnx_initializers(
    tensors: dict[str, np.ndarray], path: str | Path | None = None
) -> bytes:
    """Serialize name→array as a minimal valid ONNX ModelProto."""
    graph = b"".join(
        _field(5, 2, _encode_tensor(name, np.asarray(arr)))
        for name, arr in tensors.items()
    )
    # ir_version (field 1) + graph (field 7) is enough for our reader
    model = _field(1, 0, _write_varint(9)) + _field(7, 2, graph)
    if path is not None:
        Path(path).write_bytes(model)
    return model


def _pack_f32(values) -> bytes:
    return struct.pack(f"<{len(values)}f", *values)
