// Native batch classifier scoring — the sequential-phase hot path.
//
// The accumulate phase issues thousands of small, latency-sensitive scoring
// calls (one per mean-shift step); device dispatch over a network-tunneled
// TPU stalls there, so those calls run on host through this exact float64
// scorer, while large batched phases go to the device.  Formulas follow the
// reference semantics (Feature.cpp; sequential accumulation order), the
// decision path is Predictor.cpp:315-333.
//
// Feature ids are log2 of the FEAT_* bit flags (Feature.h:31-64).
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

struct PointsView {
    const uint32_t* counts;
    const int64_t* mags;
    const int64_t* lengths;
    const double* stddevs;
    int64_t dim;
    const uint32_t* row(int64_t i) const { return counts + i * dim; }
};

// single-feature formulas ---------------------------------------------------

double f_hellinger(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    double ap = (double)v.mags[a] / v.dim, aq = (double)v.mags[b] / v.dim;
    double sum = 0;
    for (int64_t i = 0; i < v.dim; i++) {
        double d = std::sqrt(p[i] / ap) - std::sqrt(q[i] / aq);
        sum += d * d;
    }
    return std::sqrt(2 * sum);
}

double f_manhattan(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    int64_t sum = 0;
    for (int64_t i = 0; i < v.dim; i++)
        sum += p[i] > q[i] ? p[i] - q[i] : q[i] - p[i];
    return (double)sum;
}

double f_euclidean(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    uint64_t sum = 0;
    for (int64_t i = 0; i < v.dim; i++) {
        int64_t d = (int64_t)p[i] - (int64_t)q[i];
        sum += (uint64_t)(d * d);
    }
    return std::sqrt((double)sum);
}

double f_chi2(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    double sum = 0;
    for (int64_t i = 0; i < v.dim; i++) {
        double d = (double)p[i] - (double)q[i];
        sum += d * d / ((double)p[i] + (double)q[i]);
    }
    return sum;
}

double f_normvec(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    uint64_t dot = 0, d1 = 0, d2 = 0;
    for (int64_t i = 0; i < v.dim; i++) {
        dot += (uint64_t)p[i] * q[i];
        d1 += (uint64_t)p[i] * p[i];
        d2 += (uint64_t)q[i] * q[i];
    }
    return (double)dot / std::sqrt((double)d1 * (double)d2);
}

double f_harmonic(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    double sum = 0;
    for (int64_t i = 0; i < v.dim; i++)
        sum += (double)((uint64_t)p[i] * q[i]) / ((double)p[i] + (double)q[i]);
    return 2 * sum;
}

double f_jefferey(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    double mp = (double)v.mags[a], mq = (double)v.mags[b];
    double sum = 0;
    for (int64_t i = 0; i < v.dim; i++) {
        double pp = p[i] / mp, pq = q[i] / mq;
        sum += (pp - pq) * std::log(pp / pq);
    }
    return sum;
}

double f_kdiv(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    double mp = (double)v.mags[a], mq = (double)v.mags[b];
    double sum = 0;
    for (int64_t i = 0; i < v.dim; i++) {
        double pp = p[i] / mp, pq = q[i] / mq;
        sum += pp * std::log(pp / (0.5 * (pp + pq)));
    }
    return sum;
}

double f_pearson(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    double ap = (double)v.mags[a] / v.dim, aq = (double)v.mags[b] / v.dim;
    double dot = 0, np_ = 0, nq = 0;
    for (int64_t i = 0; i < v.dim; i++) {
        double dp = p[i] - ap, dq = q[i] - aq;
        np_ += dp * dp;
        nq += dq * dq;
        dot += dp * dq;
    }
    return dot / std::sqrt(np_ * nq);
}

double f_sqchord(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    double sum = 0;
    for (int64_t i = 0; i < v.dim; i++)
        sum += (double)p[i] + q[i] - 2 * std::sqrt((double)p[i] * q[i]);
    return sum;
}

double f_klcond(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    uint64_t s4p = 0, s4q = 0;
    double op = 0, oq = 0;
    for (int64_t i = 0; i < v.dim; i++) {
        s4p += p[i];
        s4q += q[i];
        if (i % 4 == 3) {
            double ip = 0, iq = 0;
            for (int64_t j = i - 3; j <= i; j++) {
                double cp = (double)p[j] / s4p, cq = (double)q[j] / s4q;
                double lg = std::log(cp / cq);
                ip += cp * lg;
                iq += -cq * lg;
            }
            op += s4p * ip;
            oq += s4q * iq;
            s4p = s4q = 0;
        }
    }
    return (op / v.mags[a] + oq / v.mags[b]) / 2.0;
}

double f_intersection(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    uint64_t dist = 0;
    for (int64_t i = 0; i < v.dim; i++) dist += 2 * (uint64_t)std::min(p[i], q[i]);
    return (double)dist / (double)(v.mags[a] + v.mags[b]);
}

double f_emd(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    uint64_t cp = 0, cq = 0, dist = 0;
    for (int64_t i = 0; i < v.dim; i++) {
        cp += p[i];
        cq += q[i];
        dist += cp > cq ? cp - cq : cq - cp;
    }
    return (double)dist;
}

double f_lengthd(const PointsView& v, int64_t a, int64_t b) {
    int64_t lp = v.lengths[a], lq = v.lengths[b];
    return (double)(lp > lq ? lp - lq : lq - lp);
}

double f_mismatch(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    uint64_t sum = 0;
    for (int64_t i = 0; i < v.dim; i++) sum += (p[i] != q[i]);
    return (double)sum;
}

double f_canberra(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    double sum = 0;
    for (int64_t i = 0; i < v.dim; i++) {
        uint32_t num = p[i] > q[i] ? p[i] - q[i] : q[i] - p[i];
        sum += (double)num / ((double)p[i] + q[i]);
    }
    return sum;
}

double f_kul1(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    double sum = 0;
    for (int64_t i = 0; i < v.dim; i++) {
        uint32_t num = p[i] > q[i] ? p[i] - q[i] : q[i] - p[i];
        sum += (double)num / std::min(p[i], q[i]);
    }
    return sum;
}

double f_kul2(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    uint64_t min_sum = 0;
    for (int64_t i = 0; i < v.dim; i++) min_sum += std::min(p[i], q[i]);
    double ap = (double)v.mags[a] / v.dim, aq = (double)v.mags[b] / v.dim;
    double coeff = v.dim * (ap + aq) / (2 * ap * aq);
    return coeff * min_sum;
}

double f_simratio(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    uint64_t dot = 0, norm2 = 0;
    for (int64_t i = 0; i < v.dim; i++) {
        int64_t diff = (int64_t)p[i] - (int64_t)q[i];
        dot += (uint64_t)p[i] * q[i];
        norm2 += (uint64_t)(diff * diff);
    }
    return (double)dot / ((double)dot + std::sqrt((double)norm2));
}

double f_js(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    double mp = (double)v.mags[a], mq = (double)v.mags[b];
    double sum = 0;
    for (int64_t i = 0; i < v.dim; i++) {
        double pp = p[i] / mp, pq = q[i] / mq;
        double avg = 0.5 * (pp + pq);
        sum += pp * std::log(pp / avg) + pq * std::log(pq / avg);
    }
    return sum / 2;
}

double f_d2z(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    double ap = (double)v.mags[a] / v.dim, aq = (double)v.mags[b] / v.dim;
    double sp = v.stddevs[a], sq = v.stddevs[b];
    double sum = 0;
    for (int64_t i = 0; i < v.dim; i++)
        sum += ((p[i] - ap) / sp) * ((q[i] - aq) / sq);
    return sum;
}

double f_euclidean_z(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    double ap = (double)v.mags[a] / v.dim, aq = (double)v.mags[b] / v.dim;
    double sp = v.stddevs[a], sq = v.stddevs[b];
    double sum = 0;
    for (int64_t i = 0; i < v.dim; i++) {
        double d = (p[i] - ap) / sp - (q[i] - aq) / sq;
        sum += d * d;
    }
    return std::sqrt(sum);
}

double f_jaccard(const PointsView& v, int64_t a, int64_t b) {
    const uint32_t* p = v.row(a);
    const uint32_t* q = v.row(b);
    uint64_t sum = 0;
    for (int64_t i = 0; i < v.dim; i++) sum += (p[i] == q[i] && p[i] > 1);
    return (double)sum / v.dim;
}

typedef double (*feat_fn)(const PointsView&, int64_t, int64_t);

feat_fn dispatch(int32_t id) {
    switch (id) {
        case 1: return f_hellinger;
        case 2: return f_manhattan;
        case 3: return f_euclidean;
        case 4: return f_chi2;
        case 5: return f_normvec;
        case 6: return f_harmonic;
        case 7: return f_jefferey;
        case 8: return f_kdiv;
        case 9: return f_pearson;
        case 10: return f_sqchord;
        case 11: return f_klcond;
        case 13: return f_intersection;
        case 15: return f_d2z;
        case 17: return f_euclidean_z;
        case 18: return f_emd;
        case 20: return f_jaccard;
        case 21: return f_lengthd;
        case 24: return f_mismatch;
        case 25: return f_canberra;
        case 26: return f_kul1;
        case 27: return f_kul2;
        case 28: return f_simratio;
        case 29: return f_js;
        default: return nullptr;
    }
}

}  // namespace

extern "C" {

// Returns 0 on success, -1 if a feature id is unsupported.
int supports_features(const int32_t* ids, int32_t n) {
    for (int32_t i = 0; i < n; i++)
        if (!dispatch(ids[i])) return -1;
    return 0;
}

int score_block(
    const uint32_t* counts, const int64_t* mags, const int64_t* lengths,
    const double* stddevs, int64_t dim,
    const int64_t* a_rows, const int64_t* b_rows, int64_t n_pairs,
    const int32_t* single_ids, const double* mins, const double* maxs,
    const uint8_t* is_sim, int32_t n_singles,
    const int32_t* combo_kinds, const int32_t* combo_idx0,
    const int32_t* combo_idx1, int32_t n_combos,
    const double* weights, double bias,
    double* out_prob, double* out_dist) {
    feat_fn fns[64];
    for (int32_t s = 0; s < n_singles; s++) {
        fns[s] = dispatch(single_ids[s]);
        if (!fns[s]) return -1;
    }
    PointsView v{counts, mags, lengths, stddevs, dim};
#pragma omp parallel for schedule(dynamic, 16)
    for (int64_t pi = 0; pi < n_pairs; pi++) {
        int64_t a = a_rows[pi], b = b_rows[pi];
        double cache[64];
        for (int32_t s = 0; s < n_singles; s++) {
            double raw = fns[s](v, a, b);
            double val = (raw - mins[s]) / (maxs[s] - mins[s]);
            cache[s] = is_sim[s] ? val : 1.0 - val;
        }
        double sum = weights[0];
        double dist = 0;
        for (int32_t c = 0; c < n_combos; c++) {
            double x = cache[combo_idx0[c]];
            double y = combo_idx1[c] >= 0 ? cache[combo_idx1[c]] : 1.0;
            double val;
            switch (combo_kinds[c]) {
                case 0: val = x * y; break;               // xy
                case 1: val = x * y * y; break;           // xy2
                case 2: val = x * x * y; break;           // x2y
                default: val = x * x * y * y; break;      // x2y2
            }
            if (c == 0) dist = val;
            sum += weights[c + 1] * val;
        }
        out_prob[pi] = 1.0 / (1.0 + std::exp(-sum)) + bias;
        out_dist[pi] = dist;
    }
    return 0;
}

}  // extern "C"
