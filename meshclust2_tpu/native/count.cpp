// Native batched k-mer histogram construction.
//
// Equivalent of Loader::fill_table over KmerHashTable's rolling base-4 hash
// (KmerHashTable.cpp:133-160, Loader.cpp:41-86): for every sequence, count
// k-mers over its valid segments into a dense 4^k histogram with +1
// pseudocounts saturated at the histogram dtype's max, plus the pseudocounted
// 1-mer table.  OpenMP-parallel over sequences.
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <omp.h>

extern "C" {

// --threads support (CRunner.cpp:407-422 calls omp_set_num_threads): caps
// every OpenMP region in this library.
void mc2_set_num_threads(int32_t n) {
    if (n > 0) omp_set_num_threads(n);
}

// codes: concatenated int8 code arrays (0..3 valid, negative elsewhere),
//        sequence i occupying [code_offsets[i], code_offsets[i+1]).
// segs:  concatenated (start, end) inclusive pairs per sequence,
//        sequence i owning segs[2*seg_offsets[i] .. 2*seg_offsets[i+1]).
// out_counts: uint32 [n_seqs, 4^k]; out_onemers: uint64 [n_seqs, 4].
void count_kmers_batch(
    const int8_t* codes, const int64_t* code_offsets,
    const int64_t* segs, const int64_t* seg_offsets,
    int64_t n_seqs, int32_t k, uint64_t dtype_max,
    uint32_t* out_counts, uint64_t* out_onemers) {
    const int64_t dim = (int64_t)1 << (2 * k);
    const uint64_t cap = std::min<uint64_t>(dtype_max, 0xFFFFFFFFull);
#pragma omp parallel for schedule(dynamic, 8)
    for (int64_t s = 0; s < n_seqs; s++) {
        const int8_t* seq = codes + code_offsets[s];
        uint32_t* hist = out_counts + s * dim;
        uint64_t* ones = out_onemers + s * 4;
        // raw counts first
        std::memset(hist, 0, dim * sizeof(uint32_t));
        uint64_t one_raw[4] = {0, 0, 0, 0};
        for (int64_t g = seg_offsets[s]; g < seg_offsets[s + 1]; g++) {
            int64_t start = segs[2 * g];
            int64_t end = segs[2 * g + 1];
            // 1-mers over the whole segment
            for (int64_t i = start; i <= end; i++) one_raw[seq[i]]++;
            if (end - start + 1 < k) continue;
            // rolling base-4 hash, big-endian digits
            uint64_t h = 0;
            const uint64_t mask = dim - 1;
            for (int64_t i = start; i < start + k; i++) h = (h << 2) | (uint64_t)seq[i];
            hist[h]++;
            for (int64_t i = start + k; i <= end; i++) {
                h = ((h << 2) & mask) | (uint64_t)seq[i];
                hist[h]++;
            }
        }
        // +1 pseudocount with saturation (KmerHashTable.cpp:235-256)
        for (int64_t i = 0; i < dim; i++) {
            uint64_t v = (uint64_t)hist[i] + 1;
            hist[i] = (uint32_t)std::min<uint64_t>(v, cap);
        }
        for (int32_t i = 0; i < 4; i++) ones[i] = one_raw[i] + 1;
    }
}

// max over all sequences of (1 + max k-mer count), for dtype selection
// (CRunner.cpp:57-94)
uint64_t largest_pseudocount_batch(
    const int8_t* codes, const int64_t* code_offsets,
    const int64_t* segs, const int64_t* seg_offsets,
    int64_t n_seqs, int32_t k) {
    const int64_t dim = (int64_t)1 << (2 * k);
    uint64_t global_best = 0;
#pragma omp parallel
    {
        uint32_t* hist = new uint32_t[dim];
        uint64_t best = 0;
#pragma omp for schedule(dynamic, 8) nowait
        for (int64_t s = 0; s < n_seqs; s++) {
            const int8_t* seq = codes + code_offsets[s];
            std::memset(hist, 0, dim * sizeof(uint32_t));
            for (int64_t g = seg_offsets[s]; g < seg_offsets[s + 1]; g++) {
                int64_t start = segs[2 * g];
                int64_t end = segs[2 * g + 1];
                if (end - start + 1 < k) continue;
                uint64_t h = 0;
                const uint64_t mask = dim - 1;
                for (int64_t i = start; i < start + k; i++) h = (h << 2) | (uint64_t)seq[i];
                hist[h]++;
                for (int64_t i = start + k; i <= end; i++) {
                    h = ((h << 2) & mask) | (uint64_t)seq[i];
                    hist[h]++;
                }
            }
            for (int64_t i = 0; i < dim; i++)
                if (hist[i] > best) best = hist[i];
        }
#pragma omp critical
        if (best + 1 > global_best) global_best = best + 1;
        delete[] hist;
    }
    return global_best;
}

}  // extern "C"
