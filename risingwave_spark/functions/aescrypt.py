"""pgcrypto-style `encrypt` / `decrypt` (reference
`src/expr/impl/src/scalar/encrypt.rs`: AES-128/192/256, ECB or CBC
(zero IV — the reference passes `None` as IV to OpenSSL), PKCS or no
padding, mode string ``aes[-cbc|ecb][/pad:pkcs|none]`` with CBC+PKCS
defaults).

The container ships no AES library, so the cipher is implemented here
from the public FIPS-197 specification: the S-box is DERIVED (GF(2⁸)
multiplicative inverse + affine transform), not a pasted table, and the
implementation is validated against the FIPS-197 appendix-C vectors and
NIST SP 800-38A ECB vectors in tests/test_operators.py. Pure Python is
~10⁴× slower than AES-NI — fine for the column sizes pgcrypto is used
on (keys, tokens, PII fields); the Spark surface runs it as an
Arrow-batched pandas UDF, and a cluster deployment would swap
`_encrypt_block` for a real crypto provider behind the same interface.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------- GF(2^8)
def _gmul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B  # x^8 + x^4 + x^3 + x + 1
        b >>= 1
    return p


def _build_sbox() -> tuple[list[int], list[int]]:
    # multiplicative inverse via exponentiation (a^254 = a^-1 in GF(2^8))
    def inv(a: int) -> int:
        if a == 0:
            return 0
        r = 1
        for _ in range(254):
            r = _gmul(r, a)
        return r

    sbox = [0] * 256
    for i in range(256):
        c = inv(i)
        # affine transform: b ^ rotl(b,1..4) ^ 0x63
        x = c
        for shift in (1, 2, 3, 4):
            x ^= ((c << shift) | (c >> (8 - shift))) & 0xFF
        sbox[i] = x ^ 0x63
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [1]
while len(_RCON) < 14:
    _RCON.append(_gmul(_RCON[-1], 2))


# ----------------------------------------------------------- key schedule
def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    nr = {4: 10, 6: 12, 8: 14}[nk]
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    # round keys as 16-byte lists
    return [
        sum((words[4 * r + c] for c in range(4)), [])
        for r in range(nr + 1)
    ]


def _add_round_key(s: list[int], rk: list[int]) -> None:
    for i in range(16):
        s[i] ^= rk[i]


def _sub_shift(s: list[int], box: list[int], inverse: bool) -> list[int]:
    # state is column-major (FIPS-197): byte index = 4*col + row
    out = [0] * 16
    for c in range(4):
        for r in range(4):
            src_c = (c + r) % 4 if not inverse else (c - r) % 4
            out[4 * c + r] = box[s[4 * src_c + r]]
    return out


def _mix_columns(s: list[int], inverse: bool) -> list[int]:
    out = [0] * 16
    m = (
        (0x0E, 0x0B, 0x0D, 0x09) if inverse else (0x02, 0x03, 0x01, 0x01)
    )
    for c in range(4):
        col = s[4 * c : 4 * c + 4]
        for r in range(4):
            out[4 * c + r] = (
                _gmul(col[0], m[(0 - r) % 4])
                ^ _gmul(col[1], m[(1 - r) % 4])
                ^ _gmul(col[2], m[(2 - r) % 4])
                ^ _gmul(col[3], m[(3 - r) % 4])
            )
    return out


def _encrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    s = list(block)
    _add_round_key(s, rks[0])
    for rnd in range(1, len(rks) - 1):
        s = _sub_shift(s, _SBOX, False)
        s = _mix_columns(s, False)
        _add_round_key(s, rks[rnd])
    s = _sub_shift(s, _SBOX, False)
    _add_round_key(s, rks[-1])
    return bytes(s)


def _decrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    s = list(block)
    _add_round_key(s, rks[-1])
    for rnd in range(len(rks) - 2, 0, -1):
        s = _sub_shift(s, _INV_SBOX, True)
        _add_round_key(s, rks[rnd])
        s = _mix_columns(s, True)
    s = _sub_shift(s, _INV_SBOX, True)
    _add_round_key(s, rks[0])
    return bytes(s)


# ---------------------------------------------------------------- modes
_MODE_RE = re.compile(r"^(aes)(?:-(cbc|ecb))?(?:/pad:(pkcs|none))?$")


def _parse_mode(mode: str, key: bytes) -> tuple[str, bool]:
    m = _MODE_RE.match(mode)
    if not m:
        raise ValueError(
            f"invalid mode: {mode}, expect pattern algorithm[-mode][/pad:padding]"
        )
    if len(key) not in (16, 24, 32):
        raise ValueError(f"invalid key length: {len(key)}, expect 16, 24 or 32")
    return m.group(2) or "cbc", (m.group(3) or "pkcs") == "pkcs"


def encrypt(data: bytes, key: bytes, mode: str = "aes") -> bytes:
    """pgcrypto `encrypt(data, key, type)` (reference encrypt.rs:170)."""
    chain, pad = _parse_mode(mode, key)
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n]) * n
    elif len(data) % 16:
        raise ValueError("data not a multiple of block size and pad:none given")
    rks = _expand_key(key)
    out = bytearray()
    prev = bytes(16)  # CBC zero IV (the reference passes iv=None)
    for i in range(0, len(data), 16):
        block = data[i : i + 16]
        if chain == "cbc":
            block = bytes(a ^ b for a, b in zip(block, prev))
        ct = _encrypt_block(block, rks)
        out += ct
        prev = ct
    return bytes(out)


def decrypt(data: bytes, key: bytes, mode: str = "aes") -> bytes:
    """pgcrypto `decrypt(data, key, type)`."""
    chain, pad = _parse_mode(mode, key)
    if len(data) % 16:
        raise ValueError("ciphertext not a multiple of block size")
    rks = _expand_key(key)
    out = bytearray()
    prev = bytes(16)
    for i in range(0, len(data), 16):
        ct = data[i : i + 16]
        pt = _decrypt_block(ct, rks)
        if chain == "cbc":
            pt = bytes(a ^ b for a, b in zip(pt, prev))
            prev = ct
        out += pt
    if pad:
        n = out[-1]
        if not (1 <= n <= 16) or out[-n:] != bytes([n]) * n:
            raise ValueError("invalid PKCS padding in decrypted data")
        out = out[:-n]
    return bytes(out)


def encrypt_udf(data_col, key: bytes, mode: str = "aes"):
    """Arrow-batched pandas UDF column transform: encrypt a binary col."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _enc(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else encrypt(bytes(v), key, mode))

    return _enc(data_col)


def decrypt_udf(data_col, key: bytes, mode: str = "aes"):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _dec(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else decrypt(bytes(v), key, mode))

    return _dec(data_col)
