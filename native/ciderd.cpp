// CIDEr-D / CIDEr scorer over integer token sequences.
//
// Native hot path for the per-generation fitness scoring the reference does
// through the Python `cider` submodule (reference: src/captioning/
// policies.py:180 — CiderD.compute_score on every rollout). At bench scale
// (population 288 x batch 128 captions per generation) the Python scorer is
// the host bottleneck (SURVEY.md §7.3 "Host-side CIDEr in the loop"), so the
// scoring core is C++; semantics are identical to the Python implementation
// in nes_img_captioning_tpu/fitness/ciderd.py, which doubles as its test
// oracle.
//
// N-grams are packed into uint64 (4 tokens x 16 bits, each token stored +1 so
// the EOS token 0 — which participates in n-grams, see ciderd.py docstring —
// is distinguishable from an empty slot).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libciderd.so ciderd.cpp

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

constexpr int MAX_N = 4;

inline uint64_t pack(const int32_t* toks, int start, int n) {
    uint64_t h = 0;
    for (int i = 0; i < n; ++i) {
        h = (h << 16) | (uint64_t)(uint16_t)(toks[start + i] + 1);
    }
    return h;
}

// tokens up to and including the first 0 (array_to_str semantics)
inline int cut_len(const int32_t* row, int T) {
    for (int i = 0; i < T; ++i) {
        if (row[i] == 0) return i + 1;
    }
    return T;
}

struct RefVec {
    // per order: sorted (hash -> weight tf*idf) pairs, flattened
    std::vector<uint64_t> hashes[MAX_N];
    std::vector<float> weights[MAX_N];
    float norm[MAX_N];
    int length;
};

struct Image {
    std::vector<RefVec> refs;
};

struct Scorer {
    int n;          // max ngram order
    double sigma;   // length-penalty sigma
    bool clip;      // CIDEr-D: clip counts + length penalty
    double ref_len; // log(#images)
    std::unordered_map<uint64_t, float> df[MAX_N];
    std::vector<Image> images;

    double idf(int n_i, uint64_t h) const {
        auto it = df[n_i].find(h);
        double d = it == df[n_i].end() ? 0.0 : it->second;
        return ref_len - std::log(d < 1.0 ? 1.0 : d);
    }
};

// tf counts of one caption, per order: small sorted vectors
struct CandCounts {
    std::vector<std::pair<uint64_t, float>> tf[MAX_N];
    int length;
};

void count_ngrams(const int32_t* row, int T, int n_max, CandCounts* out) {
    int L = cut_len(row, T);
    out->length = L;
    for (int n = 1; n <= n_max; ++n) {
        auto& v = out->tf[n - 1];
        v.clear();
        for (int i = 0; i + n <= L; ++i) {
            uint64_t h = pack(row, i, n);
            bool found = false;
            for (auto& p : v) {
                if (p.first == h) { p.second += 1.0f; found = true; break; }
            }
            if (!found) v.emplace_back(h, 1.0f);
        }
    }
}

}  // namespace

extern "C" {

void* cider_new(int n, double sigma, int clip) {
    auto* s = new Scorer();
    s->n = n > MAX_N ? MAX_N : n;
    s->sigma = sigma;
    s->clip = clip != 0;
    s->ref_len = 0.0;
    return s;
}

void cider_free(void* h) { delete static_cast<Scorer*>(h); }

// refs: (n_rows, T) int32; img_ptr: (n_images+1) row ranges per image.
// Builds the DF table and per-reference tf-idf vectors.
void cider_fit(void* hp, const int32_t* refs, int64_t n_rows, int T,
               const int64_t* img_ptr, int64_t n_images) {
    auto* s = static_cast<Scorer*>(hp);
    for (int i = 0; i < s->n; ++i) s->df[i].clear();
    s->images.assign(n_images, Image());
    s->ref_len = std::log((double)(n_images < 1 ? 1 : n_images));

    // pass 1: document frequencies (count images, not captions)
    std::unordered_map<uint64_t, int> seen[MAX_N];
    for (int64_t im = 0; im < n_images; ++im) {
        for (int i = 0; i < s->n; ++i) seen[i].clear();
        for (int64_t r = img_ptr[im]; r < img_ptr[im + 1]; ++r) {
            const int32_t* row = refs + r * T;
            int L = cut_len(row, T);
            for (int n = 1; n <= s->n; ++n)
                for (int i = 0; i + n <= L; ++i)
                    seen[n - 1][pack(row, i, n)] = 1;
        }
        for (int i = 0; i < s->n; ++i)
            for (auto& kv : seen[i]) s->df[i][kv.first] += 1.0f;
    }

    // pass 2: per-ref tf-idf vectors + norms
    CandCounts cc;
    for (int64_t im = 0; im < n_images; ++im) {
        auto& img = s->images[im];
        img.refs.reserve(img_ptr[im + 1] - img_ptr[im]);
        for (int64_t r = img_ptr[im]; r < img_ptr[im + 1]; ++r) {
            count_ngrams(refs + r * T, T, s->n, &cc);
            RefVec rv;
            rv.length = cc.length;
            for (int n_i = 0; n_i < s->n; ++n_i) {
                double norm2 = 0.0;
                auto& hs = rv.hashes[n_i];
                auto& ws = rv.weights[n_i];
                for (auto& p : cc.tf[n_i]) {
                    float w = (float)(p.second * s->idf(n_i, p.first));
                    hs.push_back(p.first);
                    ws.push_back(w);
                    norm2 += (double)w * w;
                }
                rv.norm[n_i] = (float)std::sqrt(norm2);
            }
            img.refs.push_back(std::move(rv));
        }
    }
}

// cands: (R, T) int32; img_ids: (R,) indices into the fitted images.
// out: (R,) per-candidate scores.
void cider_score(void* hp, const int32_t* cands, int64_t R, int T,
                 const int64_t* img_ids, double* out) {
    auto* s = static_cast<Scorer*>(hp);
    CandCounts cc;
    std::vector<std::pair<uint64_t, float>> wc[MAX_N];  // hash -> weight
    for (int64_t c = 0; c < R; ++c) {
        count_ngrams(cands + c * T, T, s->n, &cc);
        double norm_c[MAX_N];
        for (int n_i = 0; n_i < s->n; ++n_i) {
            wc[n_i].clear();
            double norm2 = 0.0;
            for (auto& p : cc.tf[n_i]) {
                float w = (float)(p.second * s->idf(n_i, p.first));
                wc[n_i].emplace_back(p.first, w);
                norm2 += (double)w * w;
            }
            norm_c[n_i] = std::sqrt(norm2);
        }

        const Image& img = s->images[img_ids[c]];
        double acc = 0.0;
        for (const RefVec& rv : img.refs) {
            double val = 0.0;
            for (int n_i = 0; n_i < s->n; ++n_i) {
                double dot = 0.0;
                for (auto& p : wc[n_i]) {
                    // refs have few ngrams; linear probe beats hashing here
                    const auto& hs = rv.hashes[n_i];
                    for (size_t k = 0; k < hs.size(); ++k) {
                        if (hs[k] == p.first) {
                            float wr = rv.weights[n_i][k];
                            float w = s->clip ? (p.second < wr ? p.second : wr)
                                              : p.second;
                            dot += (double)w * wr;
                            break;
                        }
                    }
                }
                if (norm_c[n_i] != 0.0 && rv.norm[n_i] != 0.0)
                    dot /= norm_c[n_i] * rv.norm[n_i];
                val += dot;
            }
            if (s->clip) {
                double delta = (double)(cc.length - rv.length);
                val *= std::exp(-(delta * delta) / (2.0 * s->sigma * s->sigma));
            }
            acc += val;
        }
        out[c] = 10.0 * acc / (double)(img.refs.size() * s->n);
    }
}

}  // extern "C"
