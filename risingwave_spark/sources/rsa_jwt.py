"""Pure-stdlib RSA (PKCS#1 v1.5) + JWT RS256 — the service-account
auth primitive behind Google OAuth2 ("JWT bearer" grant, RFC 7523)
and Snowflake key-pair authentication.

The reference gets RS256 from its cloud SDKs (gcp-bigquery-client's
google_cloud_auth for `sink/big_query.rs`, jwt-simple for the
snowflake path); this container has no crypto libs, so the PUBLIC
algorithms are implemented directly: Miller-Rabin prime generation,
RSA sign/verify as modular exponentiation, EMSA-PKCS1-v1_5 padding
with the SHA-256 DigestInfo prefix (RFC 8017 §9.2), and the JWS
compact serialization (RFC 7515). Loopback services VERIFY signatures
with the real public key — a forged or tampered token is genuinely
rejected, same fixture posture as SigV4/SCRAM elsewhere in sources/.

Keys are plain integer dicts {n, e, d} — no ASN.1/PEM machinery needed
in-sandbox (the loopback registers the public half directly; a real
deployment would parse PEM into the same integers).
"""

from __future__ import annotations

import base64
import hashlib
import json
import secrets

# SHA-256 DigestInfo prefix (RFC 8017 §9.2 notes / RFC 5754)
_SHA256_PREFIX = bytes.fromhex(
    "3031300d060960864801650304020105000420"
)

_SMALL_PRIMES = [
    2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61,
    67, 71, 73, 79, 83, 89, 97,
]


def _is_probable_prime(n: int, rounds: int = 24) -> bool:
    if n < 2:
        return False
    for p in _SMALL_PRIMES:
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for _ in range(rounds):
        a = secrets.randbelow(n - 3) + 2
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = pow(x, 2, n)
            if x == n - 1:
                break
        else:
            return False
    return True


def _gen_prime(bits: int) -> int:
    while True:
        p = secrets.randbits(bits) | (1 << (bits - 1)) | 1
        if _is_probable_prime(p):
            return p


def generate_keypair(bits: int = 1024) -> dict:
    """→ {n, e, d} (test-fixture sizing: 1024-bit keys keep keygen
    sub-second; the math is size-agnostic)."""
    e = 65537
    while True:
        p, q = _gen_prime(bits // 2), _gen_prime(bits // 2)
        if p == q:
            continue
        n = p * q
        phi = (p - 1) * (q - 1)
        if phi % e == 0:
            continue
        return {"n": n, "e": e, "d": pow(e, -1, phi)}


def _emsa_pkcs1_v15(data: bytes, em_len: int) -> int:
    digest = hashlib.sha256(data).digest()
    t = _SHA256_PREFIX + digest
    ps = b"\xff" * (em_len - len(t) - 3)
    return int.from_bytes(b"\x00\x01" + ps + b"\x00" + t, "big")


def rs256_sign(key: dict, data: bytes) -> bytes:
    k = (key["n"].bit_length() + 7) // 8
    m = _emsa_pkcs1_v15(data, k)
    return pow(m, key["d"], key["n"]).to_bytes(k, "big")


def rs256_verify(pub: dict, data: bytes, sig: bytes) -> bool:
    k = (pub["n"].bit_length() + 7) // 8
    if len(sig) != k:
        return False
    m = pow(int.from_bytes(sig, "big"), pub["e"], pub["n"])
    return m == _emsa_pkcs1_v15(data, k)


def _b64url(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).rstrip(b"=").decode()


def _b64url_dec(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def jwt_encode(claims: dict, key: dict, kid: str | None = None) -> str:
    header = {"alg": "RS256", "typ": "JWT"}
    if kid:
        header["kid"] = kid
    signing_input = (
        _b64url(json.dumps(header, separators=(",", ":")).encode())
        + "."
        + _b64url(json.dumps(claims, separators=(",", ":")).encode())
    )
    sig = rs256_sign(key, signing_input.encode())
    return signing_input + "." + _b64url(sig)


def jwt_decode_verify(token: str, pub: dict) -> dict:
    """→ claims; raises ValueError on a bad signature or malformed
    token (the loopback services' rejection path)."""
    try:
        h, c, s = token.split(".")
    except ValueError:
        raise ValueError("malformed JWT") from None
    if not rs256_verify(pub, f"{h}.{c}".encode(), _b64url_dec(s)):
        raise ValueError("JWT signature verification failed")
    header = json.loads(_b64url_dec(h))
    if header.get("alg") != "RS256":
        raise ValueError(f"unexpected JWT alg {header.get('alg')!r}")
    return json.loads(_b64url_dec(c))


# --------------------------------------------------------------- RSA-OAEP
# (RFC 8017 §7.1, MGF1; the padding MySQL's caching_sha2_password full
# authentication uses for the password exchange) and the minimal DER/PEM
# PKCS#1 RSAPublicKey encoding the server transmits.


def _mgf1(seed: bytes, length: int) -> bytes:
    import hashlib as _h

    out = b""
    c = 0
    while len(out) < length:
        out += _h.sha1(seed + c.to_bytes(4, "big")).digest()
        c += 1
    return out[:length]


def oaep_encrypt(pub: dict, message: bytes) -> bytes:
    """RSAES-OAEP with SHA-1 (OpenSSL's RSA_PKCS1_OAEP_PADDING
    defaults, which MySQL uses)."""
    import hashlib as _h
    import os as _os

    k = (pub["n"].bit_length() + 7) // 8
    h_len = 20
    if len(message) > k - 2 * h_len - 2:
        raise ValueError("oaep: message too long for key size")
    l_hash = _h.sha1(b"").digest()
    ps = b"\x00" * (k - len(message) - 2 * h_len - 2)
    db = l_hash + ps + b"\x01" + message
    seed = _os.urandom(h_len)
    masked_db = bytes(a ^ b for a, b in zip(db, _mgf1(seed, k - h_len - 1)))
    masked_seed = bytes(
        a ^ b for a, b in zip(seed, _mgf1(masked_db, h_len)))
    em = b"\x00" + masked_seed + masked_db
    return pow(int.from_bytes(em, "big"), pub["e"], pub["n"]).to_bytes(
        k, "big")


def oaep_decrypt(key: dict, ciphertext: bytes) -> bytes:
    import hashlib as _h

    k = (key["n"].bit_length() + 7) // 8
    h_len = 20
    em = pow(int.from_bytes(ciphertext, "big"), key["d"], key["n"]).to_bytes(
        k, "big")
    masked_seed, masked_db = em[1:1 + h_len], em[1 + h_len:]
    seed = bytes(a ^ b for a, b in zip(masked_seed,
                                       _mgf1(masked_db, h_len)))
    db = bytes(a ^ b for a, b in zip(masked_db, _mgf1(seed, k - h_len - 1)))
    if db[:h_len] != _h.sha1(b"").digest():
        raise ValueError("oaep: decryption error")
    i = db.index(b"\x01", h_len)
    return db[i + 1:]


def _der_int(n: int) -> bytes:
    b = n.to_bytes((n.bit_length() + 7) // 8 or 1, "big")
    if b[0] & 0x80:
        b = b"\x00" + b
    return b"\x02" + _der_len(len(b)) + b


def _der_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    b = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(b)]) + b


def public_key_pem(pub: dict) -> bytes:
    """PKCS#1 RSAPublicKey DER (SEQUENCE{n, e}) in PEM framing — the
    shape `SHOW STATUS LIKE 'Rsa_public_key'` / the full-auth 0x02
    request returns."""
    import base64 as _b64

    body = _der_int(pub["n"]) + _der_int(pub["e"])
    der = b"\x30" + _der_len(len(body)) + body
    b64 = _b64.encodebytes(der).replace(b"\n", b"")
    lines = [b64[i:i + 64] for i in range(0, len(b64), 64)]
    return (b"-----BEGIN RSA PUBLIC KEY-----\n"
            + b"\n".join(lines)
            + b"\n-----END RSA PUBLIC KEY-----\n")


def public_key_from_pem(pem: bytes) -> dict:
    import base64 as _b64
    import re as _re

    m = _re.search(
        rb"-----BEGIN RSA PUBLIC KEY-----\s*(.*?)\s*"
        rb"-----END RSA PUBLIC KEY-----", pem, _re.S)
    if m is None:
        raise ValueError("not a PKCS#1 RSA PUBLIC KEY PEM")
    der = _b64.b64decode(b"".join(m.group(1).split()))

    def read_len(b, i):
        if b[i] < 0x80:
            return b[i], i + 1
        n = b[i] & 0x7F
        return int.from_bytes(b[i + 1:i + 1 + n], "big"), i + 1 + n

    if der[0] != 0x30:
        raise ValueError("malformed DER (no SEQUENCE)")
    _, i = read_len(der, 1)
    out = []
    for _ in range(2):
        if der[i] != 0x02:
            raise ValueError("malformed DER (no INTEGER)")
        ln, i = read_len(der, i + 1)
        out.append(int.from_bytes(der[i:i + ln], "big"))
        i += ln
    return {"n": out[0], "e": out[1]}
