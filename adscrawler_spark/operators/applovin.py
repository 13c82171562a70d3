"""AppLovin MAX payload decoder — the mitm capture's only encrypted
network format, ported from
/root/reference/adscrawler/mitm_ad_parser/decrypt_applovin.py.

Blob layout (``decode_from``, :70-103): ``version:sha1:sdk_postfix:
payload``.  v1 (:106-184): custom base64 (Java's ``+/-``/``/_``/
``=*`` alphabet), an 8-byte seed XORed with the head of
sha256(CONST_A + sdk_prefix32), then a 64-bit mix PRNG stream
(xorshift-multiply with C1/C2) XORed with the cycling 32-byte key
over 8-byte blocks.  v2 (:187-228): seed recovered by XORing the
stored little-endian word against several 64-bit derivations of
sha256(CONST_B + sdk_prefix32), then the same mix64 keystream
(:231-253), accepting the first candidate whose decompressed text
looks like json.  Decompression tries gzip then zlib window variants
(:36-47).

The four constants (CONST_A, CONST_B, C1, C2) and the per-app SDK
keys are DEPLOYMENT SECRETS in the reference (CONFIG + a db table) —
they are parameters here, never values.  ``AppLovinConfig`` carries
them; tests exercise the algorithms with synthetic constants via an
encode/decode roundtrip and an exec'd-reference parity check.

Spark shape: decoding is a per-unique-blob pure function behind an
Arrow-vectorized UDF (the same tier the reference runs it on — one
python call per captured applovin flow, mitm_logs.py:51-53), applied
only to the ``applovin.com`` slice of the capture."""

from __future__ import annotations

import base64
import gzip
import hashlib
import zlib
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_MASK64 = (1 << 64) - 1


@dataclass(frozen=True)
class AppLovinConfig:
    """The reference's CONFIG['applovin'] slice: base64-encoded
    constants and the two 64-bit PRNG multipliers, plus the SDK key
    list (query_sdk_keys)."""

    const_a_b64: str
    const_b_b64: str
    c1: int
    c2: int
    sdk_keys: tuple[str, ...] = field(default_factory=tuple)


def sha1_hex(b: bytes) -> str:
    return hashlib.sha1(b).hexdigest()


def base64_custom_decode(s: str) -> bytes:
    """:18-21 — Java used '+'→'-', '/'→'_', '='→'*'."""
    std = s.replace("-", "+").replace("_", "/").replace("*", "=")
    return base64.b64decode(std)


def base64_custom_encode(b: bytes) -> str:
    """Inverse of the custom alphabet (test/encode side)."""
    std = base64.b64encode(b).decode()
    return std.replace("+", "-").replace("/", "_").replace("=", "*")


def to_signed_64(n: int) -> int:
    """:24-33 — Java 64-bit signed long wraparound."""
    n &= _MASK64
    if n & 0x8000000000000000:
        return n - 0x10000000000000000
    return n


def try_decompress(data: bytes) -> tuple[bytes, str]:
    """:36-47 — gzip, zlib window variants, else raw."""
    try:
        return gzip.decompress(data), "gzip"
    except Exception:
        pass
    for w in (zlib.MAX_WBITS, -zlib.MAX_WBITS, 31):
        try:
            return zlib.decompress(data, w), f"zlib({w})"
        except Exception:
            pass
    return bytes(data), "none"


def sdk_prefix_for(sdk_postfix: bytes,
                   sdk_keys: tuple[str, ...]) -> str | None:
    """has_keys (:51-67): exactly one known key containing the
    postfix → its first 32 chars; zero or many → None."""
    try:
        post = sdk_postfix.decode("utf-8")
    except UnicodeDecodeError:
        return None
    keys = sorted({k for k in sdk_keys if post in k})
    if len(keys) != 1:
        return None
    return keys[0][:32]


def _v1_keystream_byte(seed: int, block_start: int, byte_offset: int,
                       c1: int, c2: int) -> int:
    """:141-172 — the per-block PRNG value's byte at ``byte_offset``.
    The shifts are python's (arithmetic on the signed intermediates),
    exactly like the reference — its '>>>' comments notwithstanding,
    the spec here is the python implementation, bug-for-bug."""
    x = seed + block_start
    x = to_signed_64((x ^ (x >> 33)) * c1)
    x = to_signed_64((x ^ (x >> 29)) * c2)
    prng_val = to_signed_64(x ^ (x >> 32))
    return (prng_val >> (byte_offset * 8)) & 0xFF


def decode_v1_from(payload: bytes, sdk_prefix32: str,
                   cfg: AppLovinConfig) -> str | None:
    """:106-184 — seed-XOR header + triple-XOR (cipher ^ key ^ prng)
    over 8-byte blocks, then decompress."""
    try:
        raw_data = base64_custom_decode(payload.decode("utf-8"))
    except Exception:
        return None
    if len(raw_data) <= 16:
        return None
    ckey = hashlib.sha256(
        cfg.const_a_b64.encode("utf-8") + sdk_prefix32.encode("utf-8")
    ).digest()
    encrypted_seed = bytearray(raw_data[:8])
    ciphertext = raw_data[8:]
    for i in range(8):
        encrypted_seed[i] ^= ckey[i]
    seed = int.from_bytes(encrypted_seed, "little")
    out = bytearray()
    for block_start in range(0, len(ciphertext), 8):
        for byte_offset in range(8):
            abs_pos = block_start + byte_offset
            if abs_pos >= len(ciphertext):
                break
            out.append(
                ciphertext[abs_pos]
                ^ ckey[abs_pos % 32]
                ^ _v1_keystream_byte(
                    seed, block_start, byte_offset, cfg.c1, cfg.c2
                )
            )
    plain, _comp = try_decompress(out)
    try:
        return plain.decode("utf-8")
    except Exception:
        return None


def mix64(seed: int, b_index: int, c1: int, c2: int) -> int:
    """:231-242 — the v2 64-bit mixing stream (unsigned wraparound
    form of the same xorshift-multiply)."""
    cc1 = ((1 << 64) + c1) & _MASK64
    cc2 = ((1 << 64) + c2) & _MASK64
    z = (seed + b_index) & _MASK64
    x = (z ^ (z >> 33)) & _MASK64
    x = (x * cc1) & _MASK64
    x = (x ^ (x >> 29)) & _MASK64
    x = (x * cc2) & _MASK64
    return (x ^ (x >> 32)) & _MASK64


def xor_permute(data: bytes, seed: int, key: bytes,
                c1: int, c2: int) -> bytes:
    """:245-253 — key[i % 32] ^ mix64-stream byte, per byte."""
    out = bytearray(data)
    cur = 0
    for i in range(len(out)):
        if (i % 8) == 0:
            cur = mix64(seed, i, c1, c2)
        out[i] ^= key[i % len(key)] ^ ((cur >> ((i % 8) * 8)) & 0xFF)
    return bytes(out)


def decode_v2_from(blob: bytes, sdk_prefix32: str,
                   cfg: AppLovinConfig) -> str | None:
    """:187-228 — recover the seed by XOR against candidate 64-bit
    digest derivations; accept the first json-looking plaintext."""
    m = blob.split(b":", 3)
    payload_start = len(b":".join(m[:3])) + 1
    seed_enc_le = int.from_bytes(
        blob[payload_start + 8: payload_start + 16], "little"
    )
    payload = blob[payload_start + 16:]
    digest = hashlib.sha256(
        cfg.const_b_b64.encode("utf-8") + sdk_prefix32.encode("utf-8")
    ).digest()
    candidates: list[int] = []
    for off in (0, 8, 16, 24):
        candidates.append(int.from_bytes(digest[off: off + 8], "little"))
        candidates.append(int.from_bytes(digest[off: off + 8], "big"))
    for endian in ("little", "big"):
        candidates.append(
            int.from_bytes(digest[0:8], endian)
            ^ int.from_bytes(digest[8:16], endian)
            ^ int.from_bytes(digest[16:24], endian)
            ^ int.from_bytes(digest[24:32], endian)
        )
    for kval in candidates:
        try:
            seed = seed_enc_le ^ kval
            dec = xor_permute(payload, seed, digest, cfg.c1, cfg.c2)
            plain, _comp = try_decompress(dec)
            text = plain.decode("utf-8", errors="ignore").strip()
            if text.startswith("{") or text.startswith("["):
                return text
        except Exception:
            continue
    return None


def decode_from(blob: bytes, cfg: AppLovinConfig) -> str | None:
    """:70-103 — version dispatch.  The reference's sha1 asserts
    compare a constant's hash with itself (a vestigial self-check
    noted by its own TODO); kept out since they can never fire."""
    try:
        m = blob.split(b":")
        version, _sha1_seen, sdk_postfix = m[0], m[1], m[2]
        if version not in (b"1", b"2"):
            return None
        prefix = sdk_prefix_for(sdk_postfix, cfg.sdk_keys)
        if prefix is None:
            return None
        if version == b"1":
            return decode_v1_from(m[3], prefix, cfg)
        return decode_v2_from(blob, prefix, cfg)
    except Exception:
        return None


# --- test/encode side (not in the reference; the inverse transform
# used by the roundtrip property tests) -------------------------------
def encode_v1(plaintext: bytes, seed: int, sdk_key: str,
              cfg: AppLovinConfig) -> bytes:
    prefix32 = sdk_key[:32]
    ckey = hashlib.sha256(
        cfg.const_a_b64.encode() + prefix32.encode()
    ).digest()
    body = bytearray()
    for block_start in range(0, len(plaintext), 8):
        for byte_offset in range(8):
            abs_pos = block_start + byte_offset
            if abs_pos >= len(plaintext):
                break
            body.append(
                plaintext[abs_pos]
                ^ ckey[abs_pos % 32]
                ^ _v1_keystream_byte(
                    seed, block_start, byte_offset, cfg.c1, cfg.c2
                )
            )
    seed_enc = bytearray(seed.to_bytes(8, "little"))
    for i in range(8):
        seed_enc[i] ^= ckey[i]
    payload = base64_custom_encode(bytes(seed_enc) + bytes(body))
    postfix = sdk_key[-16:]
    return b"1:x:" + postfix.encode() + b":" + payload.encode()


def encode_v2(plaintext: bytes, seed: int, sdk_key: str,
              cfg: AppLovinConfig) -> bytes:
    prefix32 = sdk_key[:32]
    digest = hashlib.sha256(
        cfg.const_b_b64.encode() + prefix32.encode()
    ).digest()
    kval = int.from_bytes(digest[0:8], "little")
    body = xor_permute(plaintext, seed, digest, cfg.c1, cfg.c2)
    postfix = sdk_key[-16:]
    head = b"2:x:" + postfix.encode() + b":"
    return (
        head + b"\x00" * 8
        + (seed ^ kval).to_bytes(8, "little") + body
    )


# --- Spark integration (mitm_logs.py:46-66 get_content_text) ---------
def applovin_decode_udf(cfg: AppLovinConfig):
    """Arrow UDF decoding applovin blobs, memoized per batch over
    unique blobs.  Null when the blob does not decode (the reference
    then falls back to the flow's plain text)."""

    @pandas_udf(StringType())
    def decode(blobs: pd.Series) -> pd.Series:
        uniq = {
            b: decode_from(bytes(b), cfg)
            for b in blobs.dropna().unique()
        }
        return blobs.map(uniq).astype(object).where(
            blobs.notna(), None
        )

    return decode


def decode_applovin_texts(
    flows: DataFrame,
    cfg: AppLovinConfig,
    content_col: str = "response_content",
    text_col: str = "response_text",
    tld_col: str = "tld_url",
) -> DataFrame:
    """get_content_text (mitm_logs.py:46-66): for ``applovin.com``
    flows, the decoded blob replaces the flow text; a failed decode
    falls back to the flow's own text.  Filter-split + union so the
    UDF only sees the applovin slice."""
    al = flows.filter(F.col(tld_col) == "applovin.com").withColumn(
        text_col,
        F.coalesce(
            applovin_decode_udf(cfg)(
                F.col(content_col).cast("binary")
            ),
            F.col(text_col),
        ),
    )
    rest = flows.filter(
        F.col(tld_col).isNull() | (F.col(tld_col) != "applovin.com")
    )
    return al.unionByName(rest)
