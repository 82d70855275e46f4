"""Gadget library tests.

Ports the reference's gadget test discipline (SURVEY.md §4): exhaustive
truth tables over Is/Not/Constant operand kinds, satisfiability mutation
(set a variable wrong, assert the right named constraint breaks), hash
gadgets vs hashlib, and the CONSTRAINT-COUNT PINS: SHA-256 compression =
25,840 (/root/reference/src/gadgets/sha256.rs:331), BLAKE2s = 21,518
(blake2s.rs:427), constants-only = 0."""

import hashlib
import itertools
import random

import pytest

from bellman_tpu.algebra import bls12_381 as bls
from bellman_tpu.gadgets import (
    AllocatedBit, AllocatedNum, Boolean, MultiEq, Num, TestConstraintSystem,
    UInt32, blake2s, lookup, multipack, sha256,
)
from bellman_tpu.r1cs import Unsatisfiable

Fr = bls.Fr


def new_cs():
    return TestConstraintSystem(Fr)


class TestAllocatedBit:
    def test_alloc_and_constraint(self):
        for b in (True, False):
            cs = new_cs()
            bit = AllocatedBit.alloc(cs, b)
            assert bit.get_value() == b
            assert cs.is_satisfied()
            cs.set("boolean", Fr.from_int(2))
            assert cs.which_is_unsatisfied() == "boolean constraint"

    @pytest.mark.parametrize("op,fn", [
        ("xor", lambda a, b: a ^ b),
        ("and", lambda a, b: a and b),
        ("and_not", lambda a, b: a and not b),
        ("nor", lambda a, b: not a and not b),
    ])
    def test_binops(self, op, fn):
        meth = {
            "xor": AllocatedBit.xor,
            "and": AllocatedBit.and_,
            "and_not": AllocatedBit.and_not,
            "nor": AllocatedBit.nor,
        }[op]
        for a_val, b_val in itertools.product((False, True), repeat=2):
            cs = new_cs()
            with cs.namespace("a"):
                a = AllocatedBit.alloc(cs, a_val)
            with cs.namespace("b"):
                b = AllocatedBit.alloc(cs, b_val)
            c = meth(cs, a, b)
            assert c.get_value() == fn(a_val, b_val)
            assert cs.is_satisfied()


def make_boolean(cs, kind, value, name):
    if kind == "constant":
        return Boolean.constant(value)
    if kind == "is":
        with cs.namespace(name):
            return Boolean.from_bit(AllocatedBit.alloc(cs, value))
    with cs.namespace(name):
        return Boolean.from_bit(AllocatedBit.alloc(cs, not value)).not_()


KINDS = ("constant", "is", "not")


def raw_bit(kind, value):
    """Value of the underlying AllocatedBit for an operand of ``kind``
    holding logical ``value`` (make_boolean allocates ``not value`` for
    the Not kind)."""
    return value if kind == "is" else not value


class TestBoolean:
    def test_xor_truth_table(self):
        """All 36 operand-kind/value combinations, asserting the result
        VARIANT, the allocated "xor result" value, and — for the
        allocated x allocated cases — that mutating the result breaks
        exactly the named xor constraint
        (/root/reference/src/gadgets/boolean.rs:1085-1293)."""
        for ka, kb, va, vb in itertools.product(KINDS, KINDS, (False, True),
                                                (False, True)):
            cs = new_cs()
            a = make_boolean(cs, ka, va, "a")
            b = make_boolean(cs, kb, vb, "b")
            c = Boolean.xor(cs, a, b)
            assert c.get_value() == (va ^ vb)
            assert cs.is_satisfied()

            case = (ka, kb)
            if ka == "constant" and kb == "constant":
                assert c.kind == Boolean.CONST, case
            elif ka == "constant":
                # xor with const False is b; with const True, b.not_()
                want = {"is": Boolean.IS, "not": Boolean.NOT}[kb]
                if va:
                    want = Boolean.NOT if want == Boolean.IS else Boolean.IS
                assert c.kind == want, case
            elif kb == "constant":
                want = {"is": Boolean.IS, "not": Boolean.NOT}[ka]
                if vb:
                    want = Boolean.NOT if want == Boolean.IS else Boolean.IS
                assert c.kind == want, case
            else:
                # allocated x allocated: same kinds -> Is, mixed -> Not,
                # and one "xor result" var over the RAW bits
                assert c.kind == (
                    Boolean.IS if ka == kb else Boolean.NOT
                ), case
                raw = raw_bit(ka, va) ^ raw_bit(kb, vb)
                assert cs.get("xor result") == (
                    Fr.one() if raw else Fr.zero()
                ), case
                # mutation: flip the result variable; exactly the xor
                # constraint must break
                cs.set("xor result", Fr.one() - cs.get("xor result"))
                assert cs.which_is_unsatisfied() == "xor constraint", case

    def test_and_truth_table(self):
        """All 36 combinations for and_, asserting the fused gadget
        choice (and / and_not / nor), its result variable, and the
        named constraint under mutation
        (/root/reference/src/gadgets/boolean.rs:1294-1525)."""
        for ka, kb, va, vb in itertools.product(KINDS, KINDS, (False, True),
                                                (False, True)):
            cs = new_cs()
            a = make_boolean(cs, ka, va, "a")
            b = make_boolean(cs, kb, vb, "b")
            c = Boolean.and_(cs, a, b)
            assert c.get_value() == (va and vb)
            assert cs.is_satisfied()

            case = (ka, kb, va, vb)
            if "constant" in (ka, kb):
                # const False -> Constant(False); const True -> passthrough
                if (ka == "constant" and not va) or (
                    kb == "constant" and not vb
                ):
                    assert c.kind == Boolean.CONST and not c.const, case
                elif ka == "constant":
                    assert c.kind == {"is": Boolean.IS,
                                      "not": Boolean.NOT,
                                      "constant": Boolean.CONST}[kb], case
                else:
                    assert c.kind == {"is": Boolean.IS,
                                      "not": Boolean.NOT,
                                      "constant": Boolean.CONST}[ka], case
                continue
            # allocated x allocated: is/is -> and, mixed -> and_not,
            # not/not -> nor; result is always an Is over a fresh var
            assert c.kind == Boolean.IS, case
            name = {("is", "is"): "and",
                    ("is", "not"): "and not",
                    ("not", "is"): "and not",
                    ("not", "not"): "nor"}[(ka, kb)]
            got = cs.get(f"{name} result")
            assert got == (Fr.one() if (va and vb) else Fr.zero()), case
            cs.set(f"{name} result", Fr.one() - got)
            assert cs.which_is_unsatisfied() == f"{name} constraint", case

    def test_ch_maj_truth_tables(self):
        for kinds in itertools.product(KINDS, repeat=3):
            for vals in itertools.product((False, True), repeat=3):
                cs = new_cs()
                a = make_boolean(cs, kinds[0], vals[0], "a")
                b = make_boolean(cs, kinds[1], vals[1], "b")
                c = make_boolean(cs, kinds[2], vals[2], "c")
                ch = Boolean.sha256_ch(cs, a, b, c)
                assert ch.get_value() == (
                    (vals[0] and vals[1]) ^ ((not vals[0]) and vals[2])
                )
                assert cs.is_satisfied()
                if "constant" not in kinds:
                    # generic path: mutating the fused result variable
                    # breaks exactly the named constraint
                    # (/root/reference/src/gadgets/boolean.rs:753-765)
                    cs.set("ch", Fr.one() - cs.get("ch"))
                    assert cs.which_is_unsatisfied() == "ch computation", (
                        kinds, vals,
                    )

                cs2 = new_cs()
                a = make_boolean(cs2, kinds[0], vals[0], "a")
                b = make_boolean(cs2, kinds[1], vals[1], "b")
                c = make_boolean(cs2, kinds[2], vals[2], "c")
                maj = Boolean.sha256_maj(cs2, a, b, c)
                assert maj.get_value() == (
                    (vals[0] and vals[1])
                    ^ (vals[0] and vals[2])
                    ^ (vals[1] and vals[2])
                )
                assert cs2.is_satisfied()
                if "constant" not in kinds:
                    cs2.set("maj", Fr.one() - cs2.get("maj"))
                    assert cs2.which_is_unsatisfied() == (
                        "maj computation"
                    ), (kinds, vals)

    def test_enforce_equal(self):
        cs = new_cs()
        with pytest.raises(Unsatisfiable):
            Boolean.enforce_equal(
                cs, Boolean.constant(True), Boolean.constant(False)
            )
        a = make_boolean(cs, "is", True, "a")
        with cs.namespace("eq1"):
            Boolean.enforce_equal(cs, a, Boolean.constant(True))
        assert cs.is_satisfied()
        b = make_boolean(cs, "is", False, "b")
        with cs.namespace("eq2"):
            Boolean.enforce_equal(cs, b, Boolean.constant(True))
        assert not cs.is_satisfied()


class TestNumGadget:
    def test_mul_square_inputize(self):
        rng = random.Random(0)
        cs = new_cs()
        av, bv = Fr.random(rng), Fr.random(rng)
        with cs.namespace("a"):
            a = AllocatedNum.alloc(cs, lambda: av)
        with cs.namespace("b"):
            b = AllocatedNum.alloc(cs, lambda: bv)
        with cs.namespace("mul"):
            ab = a.mul(cs, b)
        assert ab.get_value() == av * bv
        with cs.namespace("sq"):
            aa = a.square(cs)
        assert aa.get_value() == av * av
        with cs.namespace("inp"):
            ab.inputize(cs)
        assert cs.is_satisfied()
        cs.set("mul/product num", Fr.from_int(1234))
        assert cs.which_is_unsatisfied() == "mul/multiplication constraint"

    def test_to_bits_le(self):
        rng = random.Random(1)
        for strict in (False, True):
            cs = new_cs()
            v = Fr.random(rng)
            n = AllocatedNum.alloc(cs, lambda: v)
            bits = (
                n.to_bits_le_strict(cs) if strict else n.to_bits_le(cs)
            )
            assert cs.is_satisfied()
            got = sum(
                (1 << i) for i, b in enumerate(bits) if b.get_value()
            )
            assert got == int(v)

    def test_to_bits_le_strict_rejects_modulus_overflow(self):
        # -1 decomposes fine; the all-ones pattern beyond char-1 cannot
        cs = new_cs()
        n = AllocatedNum.alloc(cs, lambda: -Fr.one())
        n.to_bits_le_strict(cs)
        assert cs.is_satisfied()

    def test_assert_nonzero_and_conditionally_reverse(self):
        cs = new_cs()
        n = AllocatedNum.alloc(cs, lambda: Fr.from_int(5))
        n.assert_nonzero(cs)
        assert cs.is_satisfied()
        # mutation: wrong ephemeral inverse breaks exactly the named
        # constraint (/root/reference/src/gadgets/num.rs:506-524)
        cs.set("ephemeral inverse", Fr.from_int(5))
        assert cs.which_is_unsatisfied() == "nonzero assertion constraint"

        # zero value: the inverse witness cannot exist
        cs = new_cs()
        z = AllocatedNum.alloc(cs, lambda: Fr.zero())
        from bellman_tpu.r1cs import DivisionByZero

        with pytest.raises(DivisionByZero):
            z.assert_nonzero(cs)

        cs = new_cs()
        with cs.namespace("a"):
            a = AllocatedNum.alloc(cs, lambda: Fr.from_int(3))
        with cs.namespace("b"):
            b = AllocatedNum.alloc(cs, lambda: Fr.from_int(9))
        cond = make_boolean(cs, "is", True, "cond")
        c, d = AllocatedNum.conditionally_reverse(cs, a, b, cond)
        assert (int(c.get_value()), int(d.get_value())) == (9, 3)
        assert cs.is_satisfied()


class TestUInt32:
    def test_rotr_shr_xor(self):
        rng = random.Random(2)
        cs = new_cs()
        av, bv = rng.getrandbits(32), rng.getrandbits(32)
        with cs.namespace("a"):
            a = UInt32.alloc(cs, av)
        with cs.namespace("b"):
            b = UInt32.alloc(cs, bv)
        assert a.rotr(7).value == ((av >> 7) | (av << 25)) & 0xFFFFFFFF
        assert a.shr(9).value == av >> 9
        with cs.namespace("xor"):
            x = a.xor(cs, b)
        assert x.value == av ^ bv
        assert cs.is_satisfied()
        # rotr/shr are free
        assert cs.num_constraints() == 64 + 32

    def test_addmany(self):
        rng = random.Random(3)
        for k in (2, 3, 7, 10):
            cs = new_cs()
            vals = [rng.getrandbits(32) for _ in range(k)]
            ops = []
            for i, v in enumerate(vals):
                with cs.namespace(f"op {i}"):
                    ops.append(UInt32.alloc(cs, v))
            with MultiEq(cs) as mcs:
                res = UInt32.addmany(mcs, ops)
            assert res.value == sum(vals) & 0xFFFFFFFF
            assert cs.is_satisfied()

    def test_addmany_constants(self):
        cs = new_cs()
        with MultiEq(cs) as mcs:
            res = UInt32.addmany(
                mcs,
                [UInt32.constant(7), UInt32.constant(0xFFFFFFFF),
                 UInt32.constant(100)],
            )
        assert res.value == (7 + 0xFFFFFFFF + 100) & 0xFFFFFFFF
        assert cs.num_constraints() == 0

    def test_bit_roundtrips(self):
        rng = random.Random(4)
        v = rng.getrandbits(32)
        u = UInt32.constant(v)
        assert UInt32.from_bits(u.into_bits()).value == v
        assert UInt32.from_bits_be(u.into_bits_be()).value == v


class TestMultipack:
    def test_pack_into_inputs_matches_compute(self):
        rng = random.Random(5)
        bits = [bool(rng.getrandbits(1)) for _ in range(600)]
        cs = new_cs()
        circuit_bits = []
        for i, b in enumerate(bits):
            with cs.namespace(f"bit {i}"):
                circuit_bits.append(
                    Boolean.from_bit(AllocatedBit.alloc(cs, b))
                )
        multipack.pack_into_inputs(cs, circuit_bits)
        assert cs.is_satisfied()
        expected = multipack.compute_multipacking(Fr, bits)
        assert cs.verify(expected)

    def test_bytes_to_bits(self):
        assert multipack.bytes_to_bits(b"\x81") == [
            True, False, False, False, False, False, False, True,
        ]
        assert multipack.bytes_to_bits_le(b"\x81") == [
            True, False, False, False, False, False, False, True,
        ]
        assert multipack.bytes_to_bits(b"\x01") == [False] * 7 + [True]
        assert multipack.bytes_to_bits_le(b"\x01") == [True] + [False] * 7


class TestLookup:
    def test_lookup3_xy(self):
        rng = random.Random(6)
        coords = [(Fr.random(rng), Fr.random(rng)) for _ in range(8)]
        for idx in range(8):
            cs = new_cs()
            bits = [
                make_boolean(cs, "is", bool((idx >> i) & 1), f"b{i}")
                for i in range(3)
            ]
            x, y = lookup.lookup3_xy(cs, bits, coords)
            assert x.get_value() == coords[idx][0]
            assert y.get_value() == coords[idx][1]
            assert cs.is_satisfied()
            assert cs.num_constraints() == 3 + 2 + 1  # 3 allocs, 2 lookups, and

    def test_lookup3_xy_with_conditional_negation(self):
        rng = random.Random(7)
        coords = [(Fr.random(rng), Fr.random(rng)) for _ in range(4)]
        for idx in range(8):
            cs = new_cs()
            bits = [
                make_boolean(cs, "is", bool((idx >> i) & 1), f"b{i}")
                for i in range(3)
            ]
            x, y = lookup.lookup3_xy_with_conditional_negation(
                cs, bits, coords
            )
            want_x, want_y = coords[idx & 3]
            if idx & 4:
                want_y = -want_y
            assert x.get_value() == want_x
            assert y.get_value() == want_y
            assert cs.is_satisfied()


def to_booleans(cs, data: bytes, name: str):
    out = []
    bits = multipack.bytes_to_bits(data)
    for i, b in enumerate(bits):
        with cs.namespace(f"{name} {i}"):
            out.append(Boolean.from_bit(AllocatedBit.alloc(cs, b)))
    return out


def bits_to_bytes(bits):
    out = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for b in bits[i : i + 8]:
            byte = (byte << 1) | (1 if b.get_value() else 0)
        out.append(byte)
    return bytes(out)


class TestSha256:
    def test_constraint_count_pin(self):
        cs = new_cs()
        bits = to_booleans(cs, bytes(64), "input")
        base = cs.num_constraints()
        sha256.sha256_block_no_padding(cs, bits)
        # 25,840 constraints for one compression (sha256.rs:331)
        assert cs.num_constraints() - base == 25840
        assert cs.is_satisfied()

    def test_constants_free(self):
        cs = new_cs()
        bits = [Boolean.constant(False)] * 512
        sha256.sha256_block_no_padding(cs, bits)
        assert cs.num_constraints() == 0

    @pytest.mark.parametrize("length", [0, 1, 3, 55, 56, 64, 100])
    def test_matches_hashlib(self, length):
        rng = random.Random(length)
        data = bytes(rng.getrandbits(8) for _ in range(length))
        cs = new_cs()
        bits = to_booleans(cs, data, "input")
        out = sha256.sha256(cs, bits)
        assert cs.is_satisfied()
        assert bits_to_bytes(out) == hashlib.sha256(data).digest()


class TestBlake2s:
    def test_constraint_count_pin(self):
        cs = new_cs()
        bits = to_booleans(cs, bytes(64), "input")
        blake2s.blake2s(cs, bits, b"12345678")
        # 21,518 constraints INCLUDING the 512 input allocations
        # (blake2s.rs:421-427 counts the total)
        assert cs.num_constraints() == 21518
        assert cs.is_satisfied()

    def test_constants_free(self):
        cs = new_cs()
        bits = [Boolean.constant(False)] * 512
        blake2s.blake2s(cs, bits, b"12345678")
        assert cs.num_constraints() == 0

    @pytest.mark.parametrize("length", [0, 1, 32, 64, 65, 100])
    def test_matches_hashlib(self, length):
        rng = random.Random(100 + length)
        data = bytes(rng.getrandbits(8) for _ in range(length))
        person = b"personal"
        cs = new_cs()
        # LE bit order matches the reference's test usage
        bits = []
        for i, b in enumerate(multipack.bytes_to_bits_le(data)):
            with cs.namespace(f"input {i}"):
                bits.append(Boolean.from_bit(AllocatedBit.alloc(cs, b)))
        out = blake2s.blake2s(cs, bits, person)
        assert cs.is_satisfied()
        got = bytes(
            sum((1 if out[i + j].get_value() else 0) << j for j in range(8))
            for i in range(0, 256, 8)
        )
        want = hashlib.blake2s(data, person=person).digest()
        assert got == want


class TestTestConstraintSystem:
    def test_structural_hash_stability(self):
        def build():
            cs = new_cs()
            with cs.namespace("a"):
                a = AllocatedBit.alloc(cs, True)
            with cs.namespace("b"):
                b = AllocatedBit.alloc(cs, False)
            AllocatedBit.xor(cs, a, b)
            return cs

        assert build().hash() == build().hash()

        cs2 = new_cs()
        with cs2.namespace("a"):
            a = AllocatedBit.alloc(cs2, True)
        with cs2.namespace("b"):
            b = AllocatedBit.alloc(cs2, False)
        AllocatedBit.and_(cs2, a, b)
        assert cs2.hash() != build().hash()

    def test_pretty_print_and_paths(self):
        cs = new_cs()
        with cs.namespace("ns"):
            a = AllocatedNum.alloc(cs, lambda: Fr.from_int(10))
            a.square(cs)
        s = cs.pretty_print()
        assert "ns/squaring constraint" in s
        assert int(cs.get("ns/num")) == 10
        with pytest.raises(ValueError):
            cs.enforce("bad/name", cs.lc(), cs.lc(), cs.lc())
