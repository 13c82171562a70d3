"""AppLovin decoder: encode/decode roundtrips with synthetic
constants, parity against the reference's own decoder (exec'd out of
decrypt_applovin.py with a fake CONFIG — the real constants are
deployment secrets and appear nowhere), and the Spark capture-slice
integration."""

import base64
import gzip
import hashlib
import json
import zlib

import pytest
from pyspark.sql import functions as F

from adscrawler_spark.operators import applovin as al

REF = "/root/reference/adscrawler/mitm_ad_parser/decrypt_applovin.py"

# synthetic test constants: the public murmur3 fmix64 multipliers (as
# java signed longs) and arbitrary base64 strings — NOT the
# deployment secrets, which are config-injected in the reference
C1 = -49064778989728563
C2 = -4265267296055464877
CFG = al.AppLovinConfig(
    const_a_b64=base64.b64encode(b"synthetic-const-a").decode(),
    const_b_b64=base64.b64encode(b"synthetic-const-b").decode(),
    c1=C1,
    c2=C2,
    sdk_keys=("K" * 32 + "tailtailtailtail",),
)
KEY = CFG.sdk_keys[0]


class _Log:
    def __getattr__(self, _):
        return lambda *a, **k: None


def _load_reference():
    lines = open(REF).read().splitlines(keepends=True)
    names = {"sha1_hex", "base64_custom_decode", "to_signed_64",
             "try_decompress", "decode_v1_from", "decode_v2_from",
             "mix64", "xor_permute"}
    wanted, capture = [], False
    for ln in lines:
        if ln.startswith("def "):
            capture = ln.split("(")[0][4:] in names
        elif ln and not ln[0].isspace() and not ln.startswith(")"):
            capture = False
        if capture:
            wanted.append(ln)
    ns = {
        "base64": base64, "gzip": gzip, "zlib": zlib,
        "hashlib": hashlib, "logger": _Log(),
        "CONFIG": {"applovin": {
            "CONST_A": CFG.const_a_b64, "CONST_B": CFG.const_b_b64,
            "C1": C1, "C2": C2,
        }},
    }
    exec("".join(wanted), ns)
    return ns


PLAINTEXTS = [
    json.dumps({"ad": {"id": 7, "urls": ["https://x.com/a"]}}).encode(),
    json.dumps([1, 2, {"k": "v" * 50}]).encode(),
    (b'{"pad": "' + b"A" * 300 + b'"}'),
]


@pytest.mark.parametrize("seed", [1, 12345, (1 << 63) + 17,
                                  (1 << 64) - 3])
@pytest.mark.parametrize("plain", PLAINTEXTS)
def test_v1_roundtrip_and_reference_parity(seed, plain):
    blob = al.encode_v1(plain, seed, KEY, CFG)
    got = al.decode_from(blob, CFG)
    assert got == plain.decode()
    ref = _load_reference()
    payload = blob.split(b":")[3]
    assert ref["decode_v1_from"](payload, KEY[:32]) == plain.decode()


@pytest.mark.parametrize("seed", [9, 424242, (1 << 64) - 99])
@pytest.mark.parametrize("plain", PLAINTEXTS)
def test_v2_roundtrip_and_reference_parity(seed, plain):
    blob = al.encode_v2(plain, seed, KEY, CFG)
    got = al.decode_from(blob, CFG)
    assert got == plain.decode().strip()
    ref = _load_reference()
    assert ref["decode_v2_from"](blob, KEY[:32]) == plain.decode().strip()


def test_v1_gzip_payload_roundtrip():
    plain = json.dumps({"big": "z" * 2000}).encode()
    blob = al.encode_v1(gzip.compress(plain), 777, KEY, CFG)
    assert al.decode_from(blob, CFG) == plain.decode()


def test_decode_from_guards():
    good = al.encode_v1(PLAINTEXTS[0], 5, KEY, CFG)
    # unknown version
    assert al.decode_from(b"9" + good[1:], CFG) is None
    # unknown sdk postfix → no key resolves
    assert al.decode_from(
        good.replace(b"tailtailtailtail", b"nope"), CFG) is None
    # ambiguous keys (two known keys contain the postfix) → None
    cfg2 = al.AppLovinConfig(
        CFG.const_a_b64, CFG.const_b_b64, C1, C2,
        sdk_keys=(KEY, "L" * 32 + "tailtailtailtail"),
    )
    assert al.decode_from(good, cfg2) is None
    # garbage
    assert al.decode_from(b"not a blob", CFG) is None


def test_keystream_matches_reference_signed_shifts():
    """The PRNG uses python's arithmetic shifts on the signed
    intermediates (the reference implementation is the spec); check a
    seed that drives the intermediates negative."""
    ref = _load_reference()
    seed = (1 << 64) - 12345
    for block in (0, 8, 4096):
        x = seed + block
        x = ref["to_signed_64"]((x ^ (x >> 33)) * C1)
        x = ref["to_signed_64"]((x ^ (x >> 29)) * C2)
        prng_val = ref["to_signed_64"](x ^ (x >> 32))
        for off in range(8):
            assert al._v1_keystream_byte(seed, block, off, C1, C2) == (
                (prng_val >> (off * 8)) & 0xFF
            )


def test_spark_capture_slice_decode(spark):
    blob = al.encode_v1(PLAINTEXTS[0], 31337, KEY, CFG)
    rows = [
        ("a", "applovin.com", bytearray(blob), "fallback-a"),
        ("b", "applovin.com", bytearray(b"junk"), "fallback-b"),
        ("c", "other.com", bytearray(b"x"), "text-c"),
        ("d", None, None, "text-d"),
    ]
    flows = spark.createDataFrame(
        rows,
        "mitm_uuid string, tld_url string, response_content binary, "
        "response_text string",
    )
    out = {
        r["mitm_uuid"]: r["response_text"]
        for r in al.decode_applovin_texts(flows, CFG).collect()
    }
    assert out["a"] == PLAINTEXTS[0].decode()
    assert out["b"] == "fallback-b"
    assert out["c"] == "text-c"
    assert out["d"] == "text-d"
