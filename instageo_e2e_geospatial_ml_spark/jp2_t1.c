/* JPEG-2000 EBCOT tier-1 kernel (optional native speedup).
 *
 * A line-for-line port of the pure-Python reference implementation in
 * jp2.py (MQEncoder/MQDecoder/_T1: ITU-T T.800 Annex C arithmetic coder
 * + D.3/D.4 coding passes) — compiled lazily by jp2_native.py with the
 * system C compiler and loaded via ctypes. Everything here derives from
 * the public spec text; the Python twin remains the source of truth and
 * the fallback (tests assert bit-exact parity between the two on
 * randomized blocks, truncated streams included).
 *
 * band encoding: 0=LL 1=HL 2=LH 3=HH.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef struct { uint16_t qe; uint8_t nmps, nlps, sw; } QEnt;

static const QEnt Q[47] = {
    {0x5601, 1, 1, 1},  {0x3401, 2, 6, 0},  {0x1801, 3, 9, 0},
    {0x0AC1, 4, 12, 0}, {0x0521, 5, 29, 0}, {0x0221, 38, 33, 0},
    {0x5601, 7, 6, 1},  {0x5401, 8, 14, 0}, {0x4801, 9, 14, 0},
    {0x3801, 10, 14, 0},{0x3001, 11, 17, 0},{0x2401, 12, 18, 0},
    {0x1C01, 13, 20, 0},{0x1601, 29, 21, 0},{0x5601, 15, 14, 1},
    {0x5401, 16, 14, 0},{0x5101, 17, 15, 0},{0x4801, 18, 16, 0},
    {0x3801, 19, 17, 0},{0x3401, 20, 18, 0},{0x3001, 21, 19, 0},
    {0x2801, 22, 19, 0},{0x2401, 23, 20, 0},{0x2201, 24, 21, 0},
    {0x1C01, 25, 22, 0},{0x1801, 26, 23, 0},{0x1601, 27, 24, 0},
    {0x1401, 28, 25, 0},{0x1201, 29, 26, 0},{0x1101, 30, 27, 0},
    {0x0AC1, 31, 28, 0},{0x09C1, 32, 29, 0},{0x08A1, 33, 30, 0},
    {0x0521, 34, 31, 0},{0x0441, 35, 32, 0},{0x02A1, 36, 33, 0},
    {0x0221, 37, 34, 0},{0x0141, 38, 35, 0},{0x0111, 39, 36, 0},
    {0x0085, 40, 37, 0},{0x0049, 41, 38, 0},{0x0025, 42, 39, 0},
    {0x0015, 43, 40, 0},{0x0009, 44, 41, 0},{0x0005, 45, 42, 0},
    {0x0001, 45, 43, 0},{0x5601, 46, 46, 0},
};

#define CTX_RL 17
#define CTX_UNI 18

/* _SC_TABLE[(h+1)][(v+1)] -> {ctx, xorbit} */
static const uint8_t SC_CTX[3][3] = {{13, 12, 11}, {10, 9, 10}, {11, 12, 13}};
static const uint8_t SC_XOR[3][3] = {{1, 1, 1}, {1, 0, 0}, {0, 0, 0}};

static int zc_context(int h, int v, int d, int band) {
    if (band == 1) { int t = h; h = v; v = t; } /* HL: transposed table */
    if (band != 3) {
        if (h == 2) return 8;
        if (h == 1) return v >= 1 ? 7 : (d >= 1 ? 6 : 5);
        if (v == 2) return 4;
        if (v == 1) return 3;
        return d >= 2 ? 2 : (d == 1 ? 1 : 0);
    }
    {
        int hv = h + v;
        if (d >= 3) return 8;
        if (d == 2) return hv >= 1 ? 7 : 6;
        if (d == 1) return hv >= 2 ? 5 : (hv == 1 ? 4 : 3);
        return hv >= 2 ? 2 : (hv == 1 ? 1 : 0);
    }
}

static void init_states(uint8_t *ci, uint8_t *cm) {
    memset(ci, 0, 19);
    memset(cm, 0, 19);
    ci[0] = 4;        /* ZC all-zero context */
    ci[CTX_RL] = 3;
    ci[CTX_UNI] = 46;
}

/* ---------------- MQ decoder (Annex C) ---------------- */

typedef struct {
    const uint8_t *data;
    int n, bp;
    uint32_t c, a;
    int ct;
    uint8_t ci[19], cm[19];
} MQD;

static void dbytein(MQD *m) {
    uint8_t cur = m->bp < m->n ? m->data[m->bp] : 0xFF;
    if (cur == 0xFF) {
        uint8_t nxt = m->bp + 1 < m->n ? m->data[m->bp + 1] : 0xFF;
        if (nxt > 0x8F) { m->c += 0xFF00; m->ct = 8; }
        else {
            m->bp++;
            m->c += (uint32_t)(m->bp < m->n ? m->data[m->bp] : 0xFF) << 9;
            m->ct = 7;
        }
    } else {
        m->bp++;
        m->c += (uint32_t)(m->bp < m->n ? m->data[m->bp] : 0xFF) << 8;
        m->ct = 8;
    }
}

static void dinit(MQD *m, const uint8_t *data, int n) {
    init_states(m->ci, m->cm);
    m->data = data; m->n = n; m->bp = 0; m->ct = 0;
    m->c = (uint32_t)(n ? data[0] : 0xFF) << 16;
    dbytein(m);
    m->c <<= 7;
    m->ct -= 7;
    m->a = 0x8000;
}

static int ddecode(MQD *m, int cx) {
    const QEnt *q = &Q[m->ci[cx]];
    uint32_t qe = q->qe;
    int d;
    m->a -= qe;
    if (((m->c >> 16) & 0xFFFF) < qe) {
        if (m->a < qe) { d = m->cm[cx]; m->ci[cx] = q->nmps; }
        else {
            d = 1 - m->cm[cx];
            if (q->sw) m->cm[cx] ^= 1;
            m->ci[cx] = q->nlps;
        }
        m->a = qe;
    } else {
        m->c -= qe << 16;
        if (m->a & 0x8000) return m->cm[cx];
        if (m->a < qe) {
            d = 1 - m->cm[cx];
            if (q->sw) m->cm[cx] ^= 1;
            m->ci[cx] = q->nlps;
        } else { d = m->cm[cx]; m->ci[cx] = q->nmps; }
    }
    do {
        if (m->ct == 0) dbytein(m);
        m->a = (m->a << 1) & 0xFFFF;
        m->c = (m->c << 1) & 0xFFFFFFFFu;
        m->ct--;
    } while (!(m->a & 0x8000));
    return d;
}

/* ---------------- MQ encoder (Annex C) ---------------- */

typedef struct {
    uint64_t c;
    uint32_t a;
    int ct;
    uint8_t *out;
    int len, cap, overflow;
    uint8_t ci[19], cm[19];
} MQE;

static void ebyteout(MQE *e) {
    if (e->len >= e->cap) { e->overflow = 1; return; } /* surfaced as rc<0 */
    if (e->out[e->len - 1] == 0xFF) {
        e->out[e->len++] = (e->c >> 20) & 0xFF;
        e->c &= 0xFFFFF;
        e->ct = 7;
    } else if (e->c < 0x8000000) {
        e->out[e->len++] = (e->c >> 19) & 0xFF;
        e->c &= 0x7FFFF;
        e->ct = 8;
    } else {
        e->out[e->len - 1] += 1;
        if (e->out[e->len - 1] == 0xFF) {
            e->c &= 0x7FFFFFF;
            e->out[e->len++] = (e->c >> 20) & 0xFF;
            e->c &= 0xFFFFF;
            e->ct = 7;
        } else {
            e->out[e->len++] = (e->c >> 19) & 0xFF;
            e->c &= 0x7FFFF;
            e->ct = 8;
        }
    }
}

static void eencode(MQE *e, int d, int cx) {
    const QEnt *q = &Q[e->ci[cx]];
    uint32_t qe = q->qe;
    if (d == e->cm[cx]) { /* CODEMPS */
        e->a -= qe;
        if (e->a & 0x8000) { e->c += qe; return; }
        if (e->a < qe) e->a = qe; /* conditional exchange */
        else e->c += qe;
        e->ci[cx] = q->nmps;
    } else { /* CODELPS */
        e->a -= qe;
        if (e->a < qe) e->c += qe; /* conditional exchange */
        else e->a = qe;
        if (q->sw) e->cm[cx] ^= 1;
        e->ci[cx] = q->nlps;
    }
    do {
        e->a = (e->a << 1) & 0xFFFF;
        e->c <<= 1;
        e->ct--;
        if (e->ct == 0) ebyteout(e);
    } while (!(e->a & 0x8000));
}

/* ---------------- tier-1 shared scan machinery ---------------- */

typedef struct {
    int h, w, W, band, p;
    uint8_t *sig;     /* (h+2)*(w+2) padded */
    int8_t *sgn;      /* padded, -1/0/1 */
    uint8_t *pi;      /* h*w */
    uint8_t *refined; /* h*w */
    int64_t *mag;     /* h*w (decoder) */
    const int64_t *coefs; /* h*w (encoder, signed) */
    int64_t *absmag;  /* h*w (encoder, |coefs|) */
    MQD *dec;
    MQE *enc;
} T1;

static void nb_counts(const T1 *t, int i, int *hc, int *vc, int *dc) {
    const uint8_t *s = t->sig;
    int W = t->W;
    *hc = s[i - 1] + s[i + 1];
    *vc = s[i - W] + s[i + W];
    *dc = s[i - W - 1] + s[i - W + 1] + s[i + W - 1] + s[i + W + 1];
}

static void sign_ctx(const T1 *t, int i, int *ctx, int *xorbit) {
    const uint8_t *s = t->sig;
    const int8_t *g = t->sgn;
    int W = t->W;
    int hc = s[i - 1] * g[i - 1] + s[i + 1] * g[i + 1];
    int vc = s[i - W] * g[i - W] + s[i + W] * g[i + W];
    if (hc > 1) hc = 1;
    if (hc < -1) hc = -1;
    if (vc > 1) vc = 1;
    if (vc < -1) vc = -1;
    *ctx = SC_CTX[hc + 1][vc + 1];
    *xorbit = SC_XOR[hc + 1][vc + 1];
}

static void code_sign_new(T1 *t, int i, int j) {
    int ctx, xorbit, s;
    sign_ctx(t, i, &ctx, &xorbit);
    if (t->enc) {
        s = t->coefs[j] < 0 ? 1 : 0;
        eencode(t->enc, s ^ xorbit, ctx);
    } else {
        s = ddecode(t->dec, ctx) ^ xorbit;
        t->mag[j] = (int64_t)1 << t->p;
    }
    t->sig[i] = 1;
    t->sgn[i] = s ? -1 : 1;
}

static int code_sig(T1 *t, int i, int j) {
    int hc, vc, dc, bit;
    nb_counts(t, i, &hc, &vc, &dc);
    {
        int cx = zc_context(hc, vc, dc, t->band);
        if (t->enc) {
            bit = (int)((t->absmag[j] >> t->p) & 1);
            eencode(t->enc, bit, cx);
        } else bit = ddecode(t->dec, cx);
    }
    if (bit) code_sign_new(t, i, j);
    return bit;
}

static void pass_spp(T1 *t) {
    int h = t->h, w = t->w, W = t->W;
    for (int y0 = 0; y0 < h; y0 += 4) {
        int sh = h - y0 < 4 ? h - y0 : 4;
        for (int x = 0; x < w; x++) {
            for (int y = y0; y < y0 + sh; y++) {
                int i = (y + 1) * W + x + 1;
                int hc, vc, dc;
                if (t->sig[i]) continue;
                nb_counts(t, i, &hc, &vc, &dc);
                if (hc + vc + dc == 0) continue;
                code_sig(t, i, y * w + x);
                t->pi[y * w + x] = 1;
            }
        }
    }
}

static void pass_mrp(T1 *t) {
    int h = t->h, w = t->w, W = t->W;
    for (int y0 = 0; y0 < h; y0 += 4) {
        int sh = h - y0 < 4 ? h - y0 : 4;
        for (int x = 0; x < w; x++) {
            for (int y = y0; y < y0 + sh; y++) {
                int i = (y + 1) * W + x + 1;
                int j = y * w + x;
                int cx;
                if (!t->sig[i] || t->pi[j]) continue;
                if (t->refined[j]) cx = 16;
                else {
                    int hc, vc, dc;
                    nb_counts(t, i, &hc, &vc, &dc);
                    cx = hc + vc + dc > 0 ? 15 : 14;
                }
                if (t->enc) eencode(t->enc, (int)((t->absmag[j] >> t->p) & 1), cx);
                else if (ddecode(t->dec, cx)) t->mag[j] |= (int64_t)1 << t->p;
                t->refined[j] = 1;
                t->pi[j] = 1;
            }
        }
    }
}

static void pass_cp(T1 *t) {
    int h = t->h, w = t->w, W = t->W;
    for (int y0 = 0; y0 < h; y0 += 4) {
        int sh = h - y0 < 4 ? h - y0 : 4;
        for (int x = 0; x < w; x++) {
            int y = y0;
            if (sh == 4 && !t->pi[y0 * w + x] && !t->pi[(y0 + 1) * w + x]
                && !t->pi[(y0 + 2) * w + x] && !t->pi[(y0 + 3) * w + x]) {
                int rl_ok = 1;
                for (int yy = y0; yy < y0 + 4; yy++) {
                    int i = (yy + 1) * W + x + 1;
                    int hc, vc, dc;
                    if (t->sig[i]) { rl_ok = 0; break; }
                    nb_counts(t, i, &hc, &vc, &dc);
                    if (hc + vc + dc) { rl_ok = 0; break; }
                }
                if (rl_ok) {
                    int r = -1;
                    if (t->enc) {
                        for (int yy = 0; yy < 4; yy++)
                            if ((t->absmag[(y0 + yy) * w + x] >> t->p) & 1) { r = yy; break; }
                        if (r < 0) { eencode(t->enc, 0, CTX_RL); continue; }
                        eencode(t->enc, 1, CTX_RL);
                        eencode(t->enc, (r >> 1) & 1, CTX_UNI);
                        eencode(t->enc, r & 1, CTX_UNI);
                    } else {
                        if (!ddecode(t->dec, CTX_RL)) continue;
                        r = (ddecode(t->dec, CTX_UNI) << 1) | ddecode(t->dec, CTX_UNI);
                    }
                    {
                        int yy = y0 + r;
                        code_sign_new(t, (yy + 1) * W + x + 1, yy * w + x);
                        y = yy + 1;
                    }
                }
            }
            for (int yy = y; yy < y0 + sh; yy++) {
                int i = (yy + 1) * W + x + 1;
                int j = yy * w + x;
                if (t->sig[i] || t->pi[j]) continue;
                code_sig(t, i, j);
            }
        }
    }
}

/* ---------------- public entry points ---------------- */

int jp2_t1_decode(const uint8_t *data, int n, int h, int w, int band,
                  int nplanes, int npasses, int64_t *out) {
    int W = w + 2, P = (h + 2) * W, hw = h * w;
    if (npasses == 0 || nplanes <= 0) { memset(out, 0, (size_t)hw * 8); return 0; }
    {
        uint8_t *sig = calloc(P, 1);
        int8_t *sgn = calloc(P, 1);
        uint8_t *pi = calloc(hw, 1), *refined = calloc(hw, 1);
        int64_t *mag = calloc(hw, 8);
        MQD m;
        T1 t;
        int left = npasses, p = nplanes - 1, first = 1;
        if (!sig || !sgn || !pi || !refined || !mag) {
            free(sig); free(sgn); free(pi); free(refined); free(mag);
            return -1;
        }
        dinit(&m, data, n);
        memset(&t, 0, sizeof t);
        t.h = h; t.w = w; t.W = W; t.band = band;
        t.sig = sig; t.sgn = sgn; t.pi = pi; t.refined = refined;
        t.mag = mag; t.dec = &m;
        while (left > 0 && p >= 0) {
            t.p = p;
            if (!first) {
                pass_spp(&t);
                if (--left == 0) break;
                pass_mrp(&t);
                if (--left == 0) break;
            }
            pass_cp(&t);
            --left;
            memset(pi, 0, hw);
            p--;
            first = 0;
        }
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int8_t g = sgn[(y + 1) * W + x + 1];
                out[y * w + x] = g < 0 ? -mag[y * w + x] : mag[y * w + x];
            }
        free(sig); free(sgn); free(pi); free(refined); free(mag);
    }
    return 0;
}

/* out buffer must hold at least out_cap bytes; returns bytes written or <0.
 * npasses/nplanes are written through the pointers. */
int jp2_t1_encode(const int64_t *coefs, int h, int w, int band,
                  uint8_t *outbuf, int out_cap, int *npasses, int *nplanes) {
    int W = w + 2, P = (h + 2) * W, hw = h * w;
    int64_t maxmag = 0;
    int np = 0;
    uint8_t *sig, *pi, *refined;
    int8_t *sgn;
    int64_t *absmag;
    MQE e;
    T1 t;
    for (int j = 0; j < hw; j++) {
        int64_t v = coefs[j] < 0 ? -coefs[j] : coefs[j];
        if (v > maxmag) maxmag = v;
    }
    if (maxmag == 0) { *npasses = 0; *nplanes = 0; return 0; }
    while ((maxmag >> np) != 0) np++;
    *nplanes = np;
    sig = calloc(P, 1);
    sgn = calloc(P, 1);
    pi = calloc(hw, 1);
    refined = calloc(hw, 1);
    absmag = malloc((size_t)hw * 8);
    if (!sig || !sgn || !pi || !refined || !absmag) {
        free(sig); free(sgn); free(pi); free(refined); free(absmag);
        return -1;
    }
    for (int j = 0; j < hw; j++)
        absmag[j] = coefs[j] < 0 ? -coefs[j] : coefs[j];
    memset(&e, 0, sizeof e);
    init_states(e.ci, e.cm);
    e.a = 0x8000; e.c = 0; e.ct = 12;
    e.out = outbuf; e.cap = out_cap;
    e.out[0] = 0; /* BPST-1 dummy byte, dropped at flush */
    e.len = 1;
    memset(&t, 0, sizeof t);
    t.h = h; t.w = w; t.W = W; t.band = band;
    t.sig = sig; t.sgn = sgn; t.pi = pi; t.refined = refined;
    t.coefs = coefs; t.absmag = absmag; t.enc = &e;
    {
        int passes = 0;
        for (int p = np - 1; p >= 0; p--) {
            t.p = p;
            if (p != np - 1) {
                pass_spp(&t);
                pass_mrp(&t);
                passes += 2;
            }
            pass_cp(&t);
            passes += 1;
            memset(pi, 0, hw);
        }
        *npasses = passes;
    }
    { /* FLUSH (SETBITS + two byteouts, drop terminal FF) */
        uint64_t tempc = e.c + e.a;
        e.c |= 0xFFFF;
        if (e.c >= tempc) e.c -= 0x8000;
        e.c <<= e.ct;
        ebyteout(&e);
        e.c <<= e.ct;
        ebyteout(&e);
        if (e.len && e.out[e.len - 1] == 0xFF) e.len--;
    }
    free(sig); free(sgn); free(pi); free(refined); free(absmag);
    if (e.overflow) return -3; /* out_cap hit: stream would be truncated */
    if (outbuf[0] != 0) return -2; /* carry into the pre-stream dummy byte */
    /* shift off the dummy byte */
    memmove(outbuf, outbuf + 1, e.len - 1);
    return e.len - 1;
}
