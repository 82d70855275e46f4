// BLS12-381 pairing as a native host library.
//
// TPU-native framework component: the reference delegates pairings to the
// external `pairing`/`bls12_381` crates (SURVEY.md L0, §2.3); here the
// verifier's pairing runs as C++ (the one part of Groth16 that stays on
// the host — /root/reference/groth16/src/verifier.rs:38-57). The algorithm
// mirrors the repository's Python oracle (bellman_tpu/algebra/bls12_381.py):
// affine Miller loop with the sparse untwisted line in the direct sextic
// basis Fq12 = Fq2[w]/(w^6 - (1+u)), negative-x conjugation, and the final
// exponentiation split into the Frobenius easy part and a plain-exponent
// hard part.
//
// C ABI (all byte buffers little-endian 48-byte Fq limbs, canonical form):
//   g1 affine:  x(48) || y(48) || inf(1)                     = 97 bytes
//   g2 affine:  x.c0(48) || x.c1(48) || y.c0 || y.c1 || inf  = 193 bytes
//   fq12:       c[0].c0 || c[0].c1 || ... || c[5].c1         = 576 bytes
//
// Build: g++ -O2 -shared -fPIC -o libbls12_381_pairing.so bls12_381_pairing.cpp

#include <cstdint>
#include <cstring>

typedef unsigned __int128 u128;

// ---------------------------------------------------------------------------
// Fq: 6x64-bit Montgomery
// ---------------------------------------------------------------------------

static const uint64_t P_LIMBS[6] = {0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL, 0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL};
static const uint64_t R2_LIMBS[6] = {0xf4df1f341c341746ULL, 0x0a76e6a609d104f1ULL, 0x8de5476c4c95b6d5ULL, 0x67eb88a9939d83c0ULL, 0x9a793e85b519952dULL, 0x11988fe592cae3aaULL};
static const uint64_t P_INV = 0x89f3fffcfffcfffdULL;
// (p^4 - p^2 + 1) / r, 1268 bits
static const uint64_t FINAL_EXP_HARD[20] = {0xe516c3f438e3ba79ULL, 0xfa9912aae208ccf1ULL, 0x905ce937335d5b68ULL, 0xc71a2629b0dea236ULL, 0x83774940996754c8ULL, 0x21d160aeb6a1e799ULL, 0x2ed0b283ed237db4ULL, 0x915c97f36c6f1821ULL, 0x67f17fcbde783765ULL, 0x2378b9039096d1b7ULL, 0x7988f8761bdc51dcULL, 0x2076995003fc77a1ULL, 0x827eca0ba621315bULL, 0xe5a72bce8d63cb9fULL, 0xf68f7764c28b6f8aULL, 0x2f230063cf081517ULL, 0x94506632528d6a9aULL, 0xd3cde88eeb996ca3ULL, 0xc0bd38c3195c899eULL, 0x000f686b3d807d01ULL};
static const uint64_t BLS_X = 0xd201000000010000ULL;  // |x|; x is negative

struct Fq {
    uint64_t l[6];
};

static inline Fq fq_zero() {
    Fq r;
    std::memset(r.l, 0, sizeof(r.l));
    return r;
}

static inline bool fq_is_zero(const Fq &a) {
    uint64_t acc = 0;
    for (int i = 0; i < 6; i++) acc |= a.l[i];
    return acc == 0;
}

static inline bool fq_eq(const Fq &a, const Fq &b) {
    uint64_t acc = 0;
    for (int i = 0; i < 6; i++) acc |= a.l[i] ^ b.l[i];
    return acc == 0;
}

// a >= p ?
static inline bool fq_gte_p(const Fq &a) {
    for (int i = 5; i >= 0; i--) {
        if (a.l[i] > P_LIMBS[i]) return true;
        if (a.l[i] < P_LIMBS[i]) return false;
    }
    return true;  // equal
}

static inline void fq_sub_p(Fq &a) {
    uint64_t borrow = 0;
    for (int i = 0; i < 6; i++) {
        u128 t = (u128)a.l[i] - P_LIMBS[i] - borrow;
        a.l[i] = (uint64_t)t;
        borrow = (uint64_t)(t >> 64) ? 1 : 0;
    }
}

static inline Fq fq_add(const Fq &a, const Fq &b) {
    Fq r;
    uint64_t carry = 0;
    for (int i = 0; i < 6; i++) {
        u128 t = (u128)a.l[i] + b.l[i] + carry;
        r.l[i] = (uint64_t)t;
        carry = (uint64_t)(t >> 64);
    }
    if (carry || fq_gte_p(r)) fq_sub_p(r);
    return r;
}

static inline Fq fq_sub(const Fq &a, const Fq &b) {
    Fq r;
    uint64_t borrow = 0;
    for (int i = 0; i < 6; i++) {
        u128 t = (u128)a.l[i] - b.l[i] - borrow;
        r.l[i] = (uint64_t)t;
        borrow = (uint64_t)(t >> 64) ? 1 : 0;
    }
    if (borrow) {
        uint64_t carry = 0;
        for (int i = 0; i < 6; i++) {
            u128 t = (u128)r.l[i] + P_LIMBS[i] + carry;
            r.l[i] = (uint64_t)t;
            carry = (uint64_t)(t >> 64);
        }
    }
    return r;
}

static inline Fq fq_neg(const Fq &a) {
    if (fq_is_zero(a)) return a;
    Fq r;
    uint64_t borrow = 0;
    for (int i = 0; i < 6; i++) {
        u128 t = (u128)P_LIMBS[i] - a.l[i] - borrow;
        r.l[i] = (uint64_t)t;
        borrow = (uint64_t)(t >> 64) ? 1 : 0;
    }
    return r;
}

// CIOS Montgomery multiply
static Fq fq_mul(const Fq &a, const Fq &b) {
    uint64_t t[8] = {0, 0, 0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 6; i++) {
        // t += a_i * b
        uint64_t carry = 0;
        for (int j = 0; j < 6; j++) {
            u128 s = (u128)t[j] + (u128)a.l[i] * b.l[j] + carry;
            t[j] = (uint64_t)s;
            carry = (uint64_t)(s >> 64);
        }
        u128 s = (u128)t[6] + carry;
        t[6] = (uint64_t)s;
        t[7] = (uint64_t)(s >> 64);
        // reduce
        uint64_t m = t[0] * P_INV;
        s = (u128)t[0] + (u128)m * P_LIMBS[0];
        carry = (uint64_t)(s >> 64);
        for (int j = 1; j < 6; j++) {
            s = (u128)t[j] + (u128)m * P_LIMBS[j] + carry;
            t[j - 1] = (uint64_t)s;
            carry = (uint64_t)(s >> 64);
        }
        s = (u128)t[6] + carry;
        t[5] = (uint64_t)s;
        t[6] = t[7] + (uint64_t)(s >> 64);
        t[7] = 0;
    }
    Fq r;
    for (int i = 0; i < 6; i++) r.l[i] = t[i];
    if (t[6] || fq_gte_p(r)) fq_sub_p(r);
    return r;
}

static inline Fq fq_sqr(const Fq &a) { return fq_mul(a, a); }

static Fq fq_from_bytes_le(const uint8_t *in) {
    Fq plain;
    for (int i = 0; i < 6; i++) {
        uint64_t v = 0;
        for (int j = 7; j >= 0; j--) v = (v << 8) | in[i * 8 + j];
        plain.l[i] = v;
    }
    Fq r2;
    std::memcpy(r2.l, R2_LIMBS, sizeof(r2.l));
    return fq_mul(plain, r2);  // to Montgomery
}

static void fq_to_bytes_le(const Fq &a, uint8_t *out) {
    // from Montgomery: multiply by 1
    Fq one = fq_zero();
    one.l[0] = 1;
    Fq plain = fq_mul(a, one);
    for (int i = 0; i < 6; i++)
        for (int j = 0; j < 8; j++) out[i * 8 + j] = (uint8_t)(plain.l[i] >> (8 * j));
}

static Fq fq_one_mont() {
    Fq one = fq_zero();
    one.l[0] = 1;
    Fq r2;
    std::memcpy(r2.l, R2_LIMBS, sizeof(r2.l));
    return fq_mul(one, r2);
}

// x^e with e a little-endian limb array (Fermat inversion etc.)
static Fq fq_pow(const Fq &x, const uint64_t *e, int nlimbs) {
    Fq acc = fq_one_mont();
    int top = nlimbs - 1;
    while (top >= 0 && e[top] == 0) top--;
    if (top < 0) return acc;
    int msb = 63;
    while (!((e[top] >> msb) & 1)) msb--;
    for (int i = top; i >= 0; i--) {
        for (int b = (i == top ? msb : 63); b >= 0; b--) {
            acc = fq_sqr(acc);
            if ((e[i] >> b) & 1) acc = fq_mul(acc, x);
        }
    }
    return acc;
}

static Fq fq_inv(const Fq &x) {
    // p - 2
    uint64_t e[6];
    std::memcpy(e, P_LIMBS, sizeof(e));
    e[0] -= 2;  // p is odd, no borrow
    return fq_pow(x, e, 6);
}

// ---------------------------------------------------------------------------
// Fq2 = Fq[u]/(u^2+1)
// ---------------------------------------------------------------------------

struct Fq2 {
    Fq c0, c1;
};

static inline Fq2 fq2_zero() { return {fq_zero(), fq_zero()}; }
static inline Fq2 fq2_one() { return {fq_one_mont(), fq_zero()}; }
static inline bool fq2_is_zero(const Fq2 &a) { return fq_is_zero(a.c0) && fq_is_zero(a.c1); }
static inline bool fq2_eq(const Fq2 &a, const Fq2 &b) { return fq_eq(a.c0, b.c0) && fq_eq(a.c1, b.c1); }
static inline Fq2 fq2_add(const Fq2 &a, const Fq2 &b) { return {fq_add(a.c0, b.c0), fq_add(a.c1, b.c1)}; }
static inline Fq2 fq2_sub(const Fq2 &a, const Fq2 &b) { return {fq_sub(a.c0, b.c0), fq_sub(a.c1, b.c1)}; }
static inline Fq2 fq2_neg(const Fq2 &a) { return {fq_neg(a.c0), fq_neg(a.c1)}; }
static inline Fq2 fq2_conj(const Fq2 &a) { return {a.c0, fq_neg(a.c1)}; }

static Fq2 fq2_mul(const Fq2 &a, const Fq2 &b) {
    Fq t0 = fq_mul(a.c0, b.c0);
    Fq t1 = fq_mul(a.c1, b.c1);
    Fq t2 = fq_mul(fq_add(a.c0, a.c1), fq_add(b.c0, b.c1));
    return {fq_sub(t0, t1), fq_sub(fq_sub(t2, t0), t1)};
}

static Fq2 fq2_sqr(const Fq2 &a) {
    Fq t0 = fq_mul(fq_add(a.c0, a.c1), fq_sub(a.c0, a.c1));
    Fq t1 = fq_mul(a.c0, a.c1);
    return {t0, fq_add(t1, t1)};
}

static Fq2 fq2_inv(const Fq2 &a) {
    Fq norm = fq_add(fq_sqr(a.c0), fq_sqr(a.c1));
    Fq inv = fq_inv(norm);
    return {fq_mul(a.c0, inv), fq_neg(fq_mul(a.c1, inv))};
}

static inline Fq2 fq2_dbl(const Fq2 &a) { return fq2_add(a, a); }

// xi = 1 + u
static Fq2 fq2_mul_xi(const Fq2 &a) {
    return {fq_sub(a.c0, a.c1), fq_add(a.c0, a.c1)};
}

// ---------------------------------------------------------------------------
// Fq12 = Fq2[w]/(w^6 - xi), direct sextic representation
// ---------------------------------------------------------------------------

struct Fq12 {
    Fq2 c[6];
};

static Fq12 fq12_one() {
    Fq12 r;
    r.c[0] = fq2_one();
    for (int i = 1; i < 6; i++) r.c[i] = fq2_zero();
    return r;
}

static bool fq12_eq(const Fq12 &a, const Fq12 &b) {
    for (int i = 0; i < 6; i++)
        if (!fq2_eq(a.c[i], b.c[i])) return false;
    return true;
}

static Fq12 fq12_mul(const Fq12 &a, const Fq12 &b) {
    Fq2 acc[11];
    for (int i = 0; i < 11; i++) acc[i] = fq2_zero();
    for (int i = 0; i < 6; i++) {
        if (fq2_is_zero(a.c[i])) continue;
        for (int j = 0; j < 6; j++) {
            if (fq2_is_zero(b.c[j])) continue;
            acc[i + j] = fq2_add(acc[i + j], fq2_mul(a.c[i], b.c[j]));
        }
    }
    Fq12 r;
    for (int k = 0; k < 6; k++) r.c[k] = acc[k];
    for (int k = 6; k < 11; k++)
        r.c[k - 6] = fq2_add(r.c[k - 6], fq2_mul_xi(acc[k]));
    return r;
}

static inline Fq12 fq12_sqr(const Fq12 &a) { return fq12_mul(a, a); }

// f^(p^6): w -> -w
static Fq12 fq12_conjugate(const Fq12 &a) {
    Fq12 r = a;
    for (int i = 1; i < 6; i += 2) r.c[i] = fq2_neg(r.c[i]);
    return r;
}

// Inverse via f^-1 = conj6(f) * ... use generic: solve with the norm map
// down the tower is complex in this basis; use Gaussian elimination like
// the Python oracle? Simpler: use exponentiation f^(p^12 - 2)? too slow.
// Use the direct method: f * f^(p^6) has only even w-powers (an Fq6
// element over w^2); invert that 3-term element, then multiply.
static Fq12 fq12_inv(const Fq12 &a) {
    // n = a * conj(a): coefficients at odd powers vanish
    Fq12 conj = fq12_conjugate(a);
    Fq12 n = fq12_mul(a, conj);
    // n = n0 + n1 w^2 + n2 w^4, an element of Fq6 = Fq2[v]/(v^3 - xi)
    // with v = w^2. Invert in Fq6:
    Fq2 n0 = n.c[0], n1 = n.c[2], n2 = n.c[4];
    // standard Fq6 inversion
    Fq2 t0 = fq2_sub(fq2_sqr(n0), fq2_mul_xi(fq2_mul(n1, n2)));
    Fq2 t1 = fq2_sub(fq2_mul_xi(fq2_sqr(n2)), fq2_mul(n0, n1));
    Fq2 t2 = fq2_sub(fq2_sqr(n1), fq2_mul(n0, n2));
    Fq2 denom = fq2_add(
        fq2_mul(n0, t0),
        fq2_mul_xi(fq2_add(fq2_mul(n2, t1), fq2_mul(n1, t2))));
    Fq2 dinv = fq2_inv(denom);
    Fq2 i0 = fq2_mul(t0, dinv);
    Fq2 i1 = fq2_mul(t1, dinv);
    Fq2 i2 = fq2_mul(t2, dinv);
    Fq12 ninv;
    ninv.c[0] = i0;
    ninv.c[1] = fq2_zero();
    ninv.c[2] = i1;
    ninv.c[3] = fq2_zero();
    ninv.c[4] = i2;
    ninv.c[5] = fq2_zero();
    return fq12_mul(conj, ninv);
}

// Frobenius: f -> f^p. Fq2 coefficients conjugate; w^p = gamma_1 * w with
// gamma_i = xi^(i (p-1)/6) (computed once at init).
static Fq2 FROB_W[6];
static bool frob_initialized = false;

static Fq2 fq2_pow(const Fq2 &x, const uint64_t *e, int nlimbs) {
    Fq2 acc = fq2_one();
    int top = nlimbs - 1;
    while (top >= 0 && e[top] == 0) top--;
    if (top < 0) return acc;
    int msb = 63;
    while (!((e[top] >> msb) & 1)) msb--;
    for (int i = top; i >= 0; i--) {
        for (int b = (i == top ? msb : 63); b >= 0; b--) {
            acc = fq2_sqr(acc);
            if ((e[i] >> b) & 1) acc = fq2_mul(acc, x);
        }
    }
    return acc;
}

static void frob_init() {
    if (frob_initialized) return;
    // (p - 1) / 6
    uint64_t e[6];
    std::memcpy(e, P_LIMBS, sizeof(e));
    e[0] -= 1;
    // divide by 6 (little-endian long division by small constant)
    uint64_t rem = 0;
    for (int i = 5; i >= 0; i--) {
        u128 cur = ((u128)rem << 64) | e[i];
        e[i] = (uint64_t)(cur / 6);
        rem = (uint64_t)(cur % 6);
    }
    Fq2 xi = {fq_one_mont(), fq_one_mont()};
    Fq2 g = fq2_pow(xi, e, 6);
    FROB_W[0] = fq2_one();
    for (int i = 1; i < 6; i++) FROB_W[i] = fq2_mul(FROB_W[i - 1], g);
    frob_initialized = true;
}

static Fq12 fq12_frobenius(const Fq12 &a) {
    Fq12 r;
    for (int i = 0; i < 6; i++)
        r.c[i] = fq2_mul(fq2_conj(a.c[i]), FROB_W[i]);
    return r;
}

static Fq12 fq12_pow(const Fq12 &x, const uint64_t *e, int nlimbs) {
    Fq12 acc = fq12_one();
    int top = nlimbs - 1;
    while (top >= 0 && e[top] == 0) top--;
    if (top < 0) return acc;
    int msb = 63;
    while (!((e[top] >> msb) & 1)) msb--;
    for (int i = top; i >= 0; i--) {
        for (int b = (i == top ? msb : 63); b >= 0; b--) {
            acc = fq12_sqr(acc);
            if ((e[i] >> b) & 1) acc = fq12_mul(acc, x);
        }
    }
    return acc;
}

// ---------------------------------------------------------------------------
// Miller loop (affine, on the twist) + final exponentiation
// ---------------------------------------------------------------------------

static Fq2 XI_INV_CACHE;
static bool xi_inv_init = false;

static Fq2 xi_inv() {
    if (!xi_inv_init) {
        Fq2 xi = {fq_one_mont(), fq_one_mont()};
        XI_INV_CACHE = fq2_inv(xi);
        xi_inv_init = true;
    }
    return XI_INV_CACHE;
}

// line through T (slope mu, twist coords) evaluated at P:
// (-yP) w^0 + (yt - mu xt) xi^-1 w^3 + (mu xP) xi^-1 w^5
static Fq12 line_eval(const Fq2 &mu, const Fq2 &xt, const Fq2 &yt,
                      const Fq &px, const Fq &py) {
    Fq12 l;
    for (int i = 0; i < 6; i++) l.c[i] = fq2_zero();
    l.c[0] = {fq_neg(py), fq_zero()};
    l.c[3] = fq2_mul(fq2_sub(yt, fq2_mul(mu, xt)), xi_inv());
    Fq2 xp2 = {px, fq_zero()};
    l.c[5] = fq2_mul(fq2_mul(mu, xp2), xi_inv());
    return l;
}

struct G1A {
    Fq x, y;
    bool inf;
};
struct G2A {
    Fq2 x, y;
    bool inf;
};

static Fq12 miller_loop_one(const G1A &p, const G2A &q) {
    if (p.inf || q.inf) return fq12_one();
    Fq2 xq = q.x, yq = q.y;
    Fq2 xt = xq, yt = yq;
    Fq12 f = fq12_one();
    // bits of BLS_X below the MSB, MSB-first
    int msb = 63;
    while (!((BLS_X >> msb) & 1)) msb--;
    for (int b = msb - 1; b >= 0; b--) {
        // tangent at T
        Fq2 three_xt2 = fq2_sqr(xt);
        three_xt2 = fq2_add(fq2_dbl(three_xt2), three_xt2);
        Fq2 mu = fq2_mul(three_xt2, fq2_inv(fq2_dbl(yt)));
        f = fq12_mul(fq12_sqr(f), line_eval(mu, xt, yt, p.x, p.y));
        Fq2 x3 = fq2_sub(fq2_sub(fq2_sqr(mu), xt), xt);
        yt = fq2_sub(fq2_mul(mu, fq2_sub(xt, x3)), yt);
        xt = x3;
        if ((BLS_X >> b) & 1) {
            Fq2 mu2 = fq2_mul(fq2_sub(yq, yt), fq2_inv(fq2_sub(xq, xt)));
            f = fq12_mul(f, line_eval(mu2, xt, yt, p.x, p.y));
            Fq2 x4 = fq2_sub(fq2_sub(fq2_sqr(mu2), xt), xq);
            yt = fq2_sub(fq2_mul(mu2, fq2_sub(xt, x4)), yt);
            xt = x4;
        }
    }
    return fq12_conjugate(f);  // x is negative
}

static Fq12 final_exponentiation(const Fq12 &f) {
    frob_init();
    Fq12 f1 = fq12_mul(fq12_conjugate(f), fq12_inv(f));  // ^(p^6 - 1)
    Fq12 f2 = fq12_mul(fq12_frobenius(fq12_frobenius(f1)), f1);  // ^(p^2+1)
    return fq12_pow(f2, FINAL_EXP_HARD, 20);
}

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

static G1A read_g1(const uint8_t *in) {
    G1A p;
    p.x = fq_from_bytes_le(in);
    p.y = fq_from_bytes_le(in + 48);
    p.inf = in[96] != 0;
    return p;
}

static G2A read_g2(const uint8_t *in) {
    G2A q;
    q.x = {fq_from_bytes_le(in), fq_from_bytes_le(in + 48)};
    q.y = {fq_from_bytes_le(in + 96), fq_from_bytes_le(in + 144)};
    q.inf = in[192] != 0;
    return q;
}

static void write_fq12(const Fq12 &f, uint8_t *out) {
    for (int i = 0; i < 6; i++) {
        fq_to_bytes_le(f.c[i].c0, out + i * 96);
        fq_to_bytes_le(f.c[i].c1, out + i * 96 + 48);
    }
}

static Fq12 read_fq12(const uint8_t *in) {
    Fq12 f;
    for (int i = 0; i < 6; i++) {
        f.c[i].c0 = fq_from_bytes_le(in + i * 96);
        f.c[i].c1 = fq_from_bytes_le(in + i * 96 + 48);
    }
    return f;
}

extern "C" {

int bls_multi_miller_loop(size_t n, const uint8_t *g1s, const uint8_t *g2s,
                          uint8_t *out576) {
    Fq12 acc = fq12_one();
    for (size_t i = 0; i < n; i++) {
        G1A p = read_g1(g1s + i * 97);
        G2A q = read_g2(g2s + i * 193);
        acc = fq12_mul(acc, miller_loop_one(p, q));
    }
    write_fq12(acc, out576);
    return 0;
}

int bls_final_exp(const uint8_t *in576, uint8_t *out576) {
    Fq12 f = read_fq12(in576);
    write_fq12(final_exponentiation(f), out576);
    return 0;
}

int bls_pairing(const uint8_t *g1, const uint8_t *g2, uint8_t *out576) {
    G1A p = read_g1(g1);
    G2A q = read_g2(g2);
    write_fq12(final_exponentiation(miller_loop_one(p, q)), out576);
    return 0;
}

}  // extern "C"
