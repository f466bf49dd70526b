// Batch insert/delete-only edit alignment for LevT training supervision.
//
// Native replacement for fairseq's libnat/libnat_cuda (loaded by the
// reference at OCR/LevOCR/levt/levenshtein_utils.py:10-30). Host-side,
// train-time only: computes, per sample, insertion counts per between-token
// slot, the inserted-position mask over the target, and deletion labels.
// Exposed through a plain C ABI for ctypes (no pybind11 in this image).
//
// Semantics mirror advancedliteratemachinery_tpu/ops/levenshtein.py
// (_edit_alignment + ins_del_targets): DP with insert/delete cost 1, match
// cost 0 (no substitutions), backtrack preferring match > delete > insert.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// in_tokens  [B, Li]  (pad-padded)
// out_tokens [B, Lo]
// outputs:
//   masked    [B, Lo]  uint8 (1 = inserted in target)
//   ins_t     [B, Li-1] int32 (clamped 0..255)
//   del_t     [B, Li]  int32 (1 = delete)
void ins_del_targets(const int32_t* in_tokens, const int32_t* out_tokens,
                     int32_t B, int32_t Li, int32_t Lo, int32_t pad,
                     uint8_t* masked, int32_t* ins_t, int32_t* del_t) {
  std::vector<int32_t> src, tgt;
  std::vector<int32_t> dp;
  std::vector<uint8_t> kept, inserted;

  for (int b = 0; b < B; ++b) {
    src.clear();
    tgt.clear();
    for (int i = 0; i < Li; ++i) {
      int32_t t = in_tokens[b * Li + i];
      if (t != pad) src.push_back(t);
    }
    for (int j = 0; j < Lo; ++j) {
      int32_t t = out_tokens[b * Lo + j];
      if (t != pad) tgt.push_back(t);
    }
    const int n = (int)src.size(), m = (int)tgt.size();

    dp.assign((size_t)(n + 1) * (m + 1), 0);
    auto D = [&](int i, int j) -> int32_t& { return dp[(size_t)i * (m + 1) + j]; };
    for (int i = 0; i <= n; ++i) D(i, 0) = i;
    for (int j = 0; j <= m; ++j) D(0, j) = j;
    for (int i = 1; i <= n; ++i)
      for (int j = 1; j <= m; ++j) {
        int best = std::min(D(i - 1, j) + 1, D(i, j - 1) + 1);
        if (src[i - 1] == tgt[j - 1] && D(i - 1, j - 1) < best)
          best = D(i - 1, j - 1);
        D(i, j) = best;
      }

    kept.assign(n, 0);
    inserted.assign(m, 1);
    int i = n, j = m;
    while (i > 0 || j > 0) {
      if (i > 0 && j > 0 && src[i - 1] == tgt[j - 1] &&
          D(i, j) == D(i - 1, j - 1)) {
        kept[i - 1] = 1;
        inserted[j - 1] = 0;
        --i; --j;
      } else if (i > 0 && D(i, j) == D(i - 1, j) + 1) {
        --i;
      } else {
        --j;
      }
    }

    // insertion counts attributed to the slot after the last consumed
    // kept src token (slot -1 folded into slot 0; bos-anchored in practice)
    std::vector<int32_t> ins_counts(std::max(n, 1), 0);
    {
      int si = 0, tj = 0, slot = -1;
      while (tj < m) {
        if (inserted[tj]) {
          ins_counts[slot < 0 ? 0 : slot] += 1;
          ++tj;
        } else {
          while (si < n && !kept[si]) ++si;
          slot = si;
          ++si; ++tj;
        }
      }
    }

    uint8_t* mrow = masked + (size_t)b * Lo;
    std::memset(mrow, 0, Lo);
    for (int j2 = 0; j2 < m; ++j2) mrow[j2] = inserted[j2];

    int32_t* irow = ins_t + (size_t)b * (Li - 1);
    std::memset(irow, 0, sizeof(int32_t) * (Li - 1));
    const int slots = n > 1 ? n - 1 : 0;
    for (int s = 0; s < slots && s < Li - 1; ++s) {
      int32_t c = ins_counts[s];
      irow[s] = c > 255 ? 255 : c;
    }

    int32_t* drow = del_t + (size_t)b * Li;
    std::memset(drow, 0, sizeof(int32_t) * Li);
    for (int s = 0; s < n; ++s) drow[s] = kept[s] ? 0 : 1;
  }
}

}  // extern "C"
