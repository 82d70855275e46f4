"""Groth16 proof/key types and byte-compatible serialization.

Formats match /root/reference/groth16/src/lib.rs exactly:
* Proof: compressed a (G1) || b (G2) || c (G1) — 192 bytes on BLS12-381
  (pinned at lib.rs:559); identity points rejected on read (lib.rs:53-98).
* VerifyingKey: uncompressed alpha_g1, beta_g1, beta_g2, gamma_g2,
  delta_g1, delta_g2, then u32-BE ic length + uncompressed ic points
  (identity ic rejected) — lib.rs:143-218.
* Parameters: vk then, for each of h/l/a/b_g1/b_g2, u32-BE length +
  uncompressed points; ``checked=False`` skips subgroup/curve validation
  on trusted reads (lib.rs:289-397). 2,136 bytes for the one-constraint
  test circuit (lib.rs:529).
"""

from __future__ import annotations

import io
import struct

from ..r1cs import SynthesisError


class Proof:
    __slots__ = ("a", "b", "c")

    def __init__(self, a, b, c):
        self.a = a
        self.b = b
        self.c = c

    def __eq__(self, o):
        return (
            isinstance(o, Proof) and self.a == o.a and self.b == o.b and self.c == o.c
        )

    def write(self, w) -> None:
        w.write(self.a.to_compressed())
        w.write(self.b.to_compressed())
        w.write(self.c.to_compressed())

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        self.write(buf)
        return buf.getvalue()

    @classmethod
    def read(cls, r, engine):
        def read_point(group):
            data = r.read(group.COMPRESSED_SIZE)
            pt = group.from_compressed(data)
            if pt.is_identity():
                raise ValueError("point at infinity")
            return pt

        a = read_point(engine.G1)
        b = read_point(engine.G2)
        c = read_point(engine.G1)
        return cls(a, b, c)

    @classmethod
    def from_bytes(cls, data: bytes, engine):
        return cls.read(io.BytesIO(data), engine)


class VerifyingKey:
    __slots__ = (
        "alpha_g1", "beta_g1", "beta_g2", "gamma_g2", "delta_g1", "delta_g2", "ic",
    )

    def __init__(self, alpha_g1, beta_g1, beta_g2, gamma_g2, delta_g1, delta_g2, ic):
        self.alpha_g1 = alpha_g1
        self.beta_g1 = beta_g1
        self.beta_g2 = beta_g2
        self.gamma_g2 = gamma_g2
        self.delta_g1 = delta_g1
        self.delta_g2 = delta_g2
        self.ic = list(ic)

    def __eq__(self, o):
        return (
            isinstance(o, VerifyingKey)
            and self.alpha_g1 == o.alpha_g1
            and self.beta_g1 == o.beta_g1
            and self.beta_g2 == o.beta_g2
            and self.gamma_g2 == o.gamma_g2
            and self.delta_g1 == o.delta_g1
            and self.delta_g2 == o.delta_g2
            and self.ic == o.ic
        )

    def write(self, w) -> None:
        w.write(self.alpha_g1.to_uncompressed())
        w.write(self.beta_g1.to_uncompressed())
        w.write(self.beta_g2.to_uncompressed())
        w.write(self.gamma_g2.to_uncompressed())
        w.write(self.delta_g1.to_uncompressed())
        w.write(self.delta_g2.to_uncompressed())
        w.write(struct.pack(">I", len(self.ic)))
        for p in self.ic:
            w.write(p.to_uncompressed())

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        self.write(buf)
        return buf.getvalue()

    @classmethod
    def read(cls, r, engine):
        def rg(group):
            return group.from_uncompressed(r.read(group.UNCOMPRESSED_SIZE))

        alpha_g1 = rg(engine.G1)
        beta_g1 = rg(engine.G1)
        beta_g2 = rg(engine.G2)
        gamma_g2 = rg(engine.G2)
        delta_g1 = rg(engine.G1)
        delta_g2 = rg(engine.G2)
        (ic_len,) = struct.unpack(">I", r.read(4))
        ic = []
        for _ in range(ic_len):
            p = rg(engine.G1)
            if p.is_identity():
                raise ValueError("point at infinity")
            ic.append(p)
        return cls(alpha_g1, beta_g1, beta_g2, gamma_g2, delta_g1, delta_g2, ic)

    @classmethod
    def from_bytes(cls, data: bytes, engine):
        return cls.read(io.BytesIO(data), engine)


class Parameters:
    """The full CRS. Query semantics (lib.rs:225-243):

    * ``h[i] = g1 * (tau^i * t(tau) / delta)``, i in 0..m-1
    * ``l[i] = g1 * ((beta u_i + alpha v_i + w_i)(tau) / delta)`` per aux var
    * ``a`` / ``b_g1`` / ``b_g2``: QAP polynomial evaluations at tau with
      zero evaluations filtered out (inputs first, then aux)
    """

    __slots__ = ("vk", "h", "l", "a", "b_g1", "b_g2")

    def __init__(self, vk, h, l, a, b_g1, b_g2):
        self.vk = vk
        self.h = list(h)
        self.l = list(l)
        self.a = list(a)
        self.b_g1 = list(b_g1)
        self.b_g2 = list(b_g2)

    def __eq__(self, o):
        return (
            isinstance(o, Parameters)
            and self.vk == o.vk
            and self.h == o.h
            and self.l == o.l
            and self.a == o.a
            and self.b_g1 == o.b_g1
            and self.b_g2 == o.b_g2
        )

    def write(self, w) -> None:
        self.vk.write(w)
        for vec in (self.h, self.l, self.a, self.b_g1):
            w.write(struct.pack(">I", len(vec)))
            for p in vec:
                w.write(p.to_uncompressed())
        w.write(struct.pack(">I", len(self.b_g2)))
        for p in self.b_g2:
            w.write(p.to_uncompressed())

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        self.write(buf)
        return buf.getvalue()

    @classmethod
    def read(cls, r, engine, checked: bool = True):
        def rg(group):
            p = group.from_uncompressed(
                r.read(group.UNCOMPRESSED_SIZE), checked=checked
            )
            if p.is_identity():
                raise ValueError("point at infinity")
            return p

        vk = VerifyingKey.read(r, engine)
        out = []
        for group in (engine.G1, engine.G1, engine.G1, engine.G1, engine.G2):
            (n,) = struct.unpack(">I", r.read(4))
            out.append([rg(group) for _ in range(n)])
        h, l, a, b_g1, b_g2 = out
        return cls(vk, h, l, a, b_g1, b_g2)

    @classmethod
    def from_bytes(cls, data: bytes, engine, checked: bool = True):
        return cls.read(io.BytesIO(data), engine, checked)

    # -- ParameterSource behavior (lib.rs:411-474) --------------------------
    def get_vk(self, _num_ic: int) -> VerifyingKey:
        return self.vk

    def get_h(self, _n):
        return self.h

    def get_l(self, _n):
        return self.l

    def get_a(self, num_inputs, _num_aux=None):
        return self.a[:num_inputs], self.a[num_inputs:]

    def get_b_g1(self, num_inputs, _num_aux=None):
        return self.b_g1[:num_inputs], self.b_g1[num_inputs:]

    def get_b_g2(self, num_inputs, _num_aux=None):
        return self.b_g2[:num_inputs], self.b_g2[num_inputs:]
