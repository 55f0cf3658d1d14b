"""Vault-encrypted YAML secrets — the reference's ``encrypt_string``.

Reference: ``pipelinewise/cli/__init__.py:42`` + ``utils.vault_encrypt`` —
secrets in pipeline YAML (DB passwords, S3 keys) are Ansible-vault-encrypted
with a secret file and decrypted transparently at import time, so project
files can live in git without plaintext credentials.

This engine's twin uses only the Python standard library (no crypto
dependency is shipped in the runtime): AES is unavailable in stdlib, so the
cipher is the classic encrypt-then-MAC construction over an HMAC-SHA256
counter-mode keystream:

- key derivation: PBKDF2-HMAC-SHA256 (200k iterations, 16-byte random
  salt) stretches the secret into independent 32-byte encryption and MAC
  keys;
- encryption: ``block_i = HMAC(enc_key, salt || big_endian(i))`` XORed
  with the plaintext (CTR mode with HMAC as the PRF — a standard PRF-CTR
  stream cipher);
- integrity: ``HMAC(mac_key, header || salt || ciphertext)`` appended and
  verified (constant-time) before any decryption output.

Token format (one line, YAML-safe):
``$PWS_VAULT;1.0;HCTR256$<salt_hex>$<ct_hex>$<mac_hex>``

``compile_yaml`` decrypts any string value carrying the prefix when a
vault secret is available (``PWS_VAULT_SECRET`` / ``PWS_VAULT_SECRET_FILE``
env, or an explicit ``secret=`` argument) and fails loudly when one is
not — a config with undecryptable secrets must never run half-configured.
"""

from __future__ import annotations

import hashlib
import hmac
import os
import secrets as _secrets

_HEADER = "$PWS_VAULT;1.0;HCTR256"
_ITERATIONS = 200_000


def is_vault_token(value: object) -> bool:
    return isinstance(value, str) and value.startswith(_HEADER + "$")


def _derive(secret: str, salt: bytes) -> tuple[bytes, bytes]:
    km = hashlib.pbkdf2_hmac(
        "sha256", secret.encode("utf-8"), salt, _ITERATIONS, dklen=64
    )
    return km[:32], km[32:]


def _keystream(enc_key: bytes, salt: bytes, n: int) -> bytes:
    out = bytearray()
    counter = 0
    while len(out) < n:
        out += hmac.new(
            enc_key, salt + counter.to_bytes(8, "big"), hashlib.sha256
        ).digest()
        counter += 1
    return bytes(out[:n])


def vault_encrypt(plaintext: str, secret: str) -> str:
    """Encrypt ``plaintext`` with ``secret`` into a one-line vault token."""
    salt = _secrets.token_bytes(16)
    enc_key, mac_key = _derive(secret, salt)
    pt = plaintext.encode("utf-8")
    ct = bytes(a ^ b for a, b in zip(pt, _keystream(enc_key, salt, len(pt))))
    mac = hmac.new(
        mac_key, _HEADER.encode() + salt + ct, hashlib.sha256
    ).hexdigest()
    return f"{_HEADER}${salt.hex()}${ct.hex()}${mac}"


def vault_decrypt(token: str, secret: str) -> str:
    """Decrypt a token produced by :func:`vault_encrypt`. Raises
    ``ValueError`` on format errors, wrong secret, or tampering — the MAC
    is verified (constant-time) before any plaintext is derived."""
    if not is_vault_token(token):
        raise ValueError("not a PWS_VAULT token")
    try:
        _, salt_hex, ct_hex, mac_hex = token.rsplit("$", 3)
        salt, ct = bytes.fromhex(salt_hex), bytes.fromhex(ct_hex)
    except Exception as exc:
        raise ValueError(f"malformed vault token: {exc}") from exc
    enc_key, mac_key = _derive(secret, salt)
    want = hmac.new(mac_key, _HEADER.encode() + salt + ct, hashlib.sha256)
    if not hmac.compare_digest(want.hexdigest(), mac_hex):
        raise ValueError("vault MAC verification failed (wrong secret or tampered token)")
    pt = bytes(a ^ b for a, b in zip(ct, _keystream(enc_key, salt, len(ct))))
    return pt.decode("utf-8")


def resolve_secret(secret: str | None = None) -> str | None:
    """Secret resolution order: explicit arg → ``PWS_VAULT_SECRET`` env →
    contents of ``PWS_VAULT_SECRET_FILE``. None when nothing is set."""
    if secret is not None:
        return secret
    env = os.environ.get("PWS_VAULT_SECRET")
    if env:
        return env
    path = os.environ.get("PWS_VAULT_SECRET_FILE")
    if path and os.path.exists(path):
        with open(path, encoding="utf-8") as fh:
            return fh.read().strip()
    return None


def decrypt_tree(doc, secret: str | None):
    """Recursively decrypt every vault token in a parsed-YAML tree.
    Raises ``ValueError`` if a token is present but no secret resolves —
    a pipeline must never run with an undecrypted credential."""
    if is_vault_token(doc):
        s = resolve_secret(secret)
        if s is None:
            raise ValueError(
                "config contains vault-encrypted values but no vault secret "
                "is set (PWS_VAULT_SECRET / PWS_VAULT_SECRET_FILE)"
            )
        return vault_decrypt(doc, s)
    if isinstance(doc, dict):
        return {k: decrypt_tree(v, secret) for k, v in doc.items()}
    if isinstance(doc, list):
        return [decrypt_tree(v, secret) for v in doc]
    return doc
