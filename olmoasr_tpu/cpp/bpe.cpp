// Native byte-level BPE tokenizer core.
//
// The reference reaches native tokenization through tiktoken (Rust) via the
// openai-whisper package (SURVEY.md §2.2). This is the TPU-framework's C++
// equivalent: tiktoken-format mergeable ranks, GPT-2-style pre-tokenization,
// lowest-rank-first merge loop. Exposed through a C ABI for ctypes
// (olmoasr_tpu/tokenizer_native.py); the pure-Python engine in
// olmoasr_tpu/tokenizer.py is the exact-semantics reference implementation.
//
// Unicode note: the GPT-2 pattern's \p{L}/\p{N} classes are approximated —
// ASCII is classified exactly; non-ASCII UTF-8 sequences are treated as
// letters. Identical results to the Python engine on ASCII/English text
// (OLMoASR is English-only); the Python engine remains the fallback for
// anything else.
//
// Build: olmoasr_tpu/cpp/build.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Encoder {
  std::unordered_map<std::string, int> ranks;
  bool byte_fallback = false;  // ids 0..255 = raw bytes
};

// ---- base64 ---------------------------------------------------------------

int b64_val(char c) {
  if (c >= 'A' && c <= 'Z') return c - 'A';
  if (c >= 'a' && c <= 'z') return c - 'a' + 26;
  if (c >= '0' && c <= '9') return c - '0' + 52;
  if (c == '+') return 62;
  if (c == '/') return 63;
  return -1;
}

std::string b64_decode(const std::string& in) {
  std::string out;
  int val = 0, bits = 0;
  for (char c : in) {
    if (c == '=') break;
    int d = b64_val(c);
    if (d < 0) continue;
    val = (val << 6) | d;
    bits += 6;
    if (bits >= 8) {
      bits -= 8;
      out.push_back(static_cast<char>((val >> bits) & 0xFF));
    }
  }
  return out;
}

// ---- pre-tokenization (GPT-2 pattern, ASCII-exact) --------------------------

inline bool is_ascii_letter(unsigned char c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z');
}
inline bool is_ascii_digit(unsigned char c) { return c >= '0' && c <= '9'; }
inline bool is_space(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\v';
}
// non-ASCII bytes are treated as letters (see unicode note above)
inline bool is_letter(unsigned char c) { return is_ascii_letter(c) || c >= 0x80; }

// Split text into GPT-2 pre-tokens:
//   's|'t|'re|'ve|'m|'ll|'d | ?L+ | ?N+ | ?[^ LN]+ | \s+(?!\S) | \s+
std::vector<std::string> pretokenize(const std::string& s) {
  std::vector<std::string> out;
  size_t i = 0, n = s.size();
  while (i < n) {
    // contractions
    if (s[i] == '\'' && i + 1 < n) {
      static const char* contractions[] = {"'s", "'t", "'re", "'ve", "'m", "'ll", "'d"};
      bool matched = false;
      for (const char* c : contractions) {
        size_t len = std::strlen(c);
        if (i + len <= n && s.compare(i, len, c) == 0) {
          // GPT-2 contractions are case-sensitive lowercase
          out.emplace_back(s.substr(i, len));
          i += len;
          matched = true;
          break;
        }
      }
      if (matched) continue;
    }
    unsigned char c = s[i];
    size_t start = i;
    if (is_space(c)) {
      size_t j = i;
      while (j < n && is_space(static_cast<unsigned char>(s[j]))) j++;
      if (j < n && j - i > 1) {
        // \s+(?!\S): all but the last space, which prefixes the next token
        out.emplace_back(s.substr(i, j - i - 1));
        i = j - 1;
        // fall through: single leading space handled below
        c = s[i];
      } else if (j == n) {
        out.emplace_back(s.substr(i, j - i));
        i = j;
        continue;
      }
      // single space: belongs to the following token
    }
    size_t j = i;
    bool lead_space = (s[j] == ' ');
    if (lead_space) j++;
    if (j >= n) {
      out.emplace_back(s.substr(i));
      break;
    }
    unsigned char d = s[j];
    if (is_letter(d)) {
      size_t k = j;
      while (k < n && is_letter(static_cast<unsigned char>(s[k]))) k++;
      out.emplace_back(s.substr(i, k - i));
      i = k;
    } else if (is_ascii_digit(d)) {
      size_t k = j;
      while (k < n && is_ascii_digit(static_cast<unsigned char>(s[k]))) k++;
      out.emplace_back(s.substr(i, k - i));
      i = k;
    } else if (is_space(d)) {
      // a space followed by space run: emit the single space alone
      out.emplace_back(s.substr(i, 1));
      i++;
    } else {
      size_t k = j;
      while (k < n) {
        unsigned char e = s[k];
        if (is_space(e) || is_letter(e) || is_ascii_digit(e)) break;
        k++;
      }
      out.emplace_back(s.substr(i, k - i));
      i = k;
    }
    (void)start;
  }
  return out;
}

// ---- merge loop -------------------------------------------------------------

void bpe_merge(const Encoder& enc, const std::string& piece, std::vector<int>& out) {
  auto whole = enc.ranks.find(piece);
  if (whole != enc.ranks.end()) {
    out.push_back(whole->second);
    return;
  }
  // parts[i] = (start offset); merge lowest-rank adjacent pair first
  std::vector<size_t> starts;
  starts.reserve(piece.size() + 1);
  for (size_t i = 0; i <= piece.size(); i++) starts.push_back(i);

  auto rank_of = [&](size_t a, size_t b, size_t c) -> int64_t {
    auto it = enc.ranks.find(piece.substr(starts[a], starts[c] - starts[a]));
    (void)b;
    return it == enc.ranks.end() ? INT64_MAX : it->second;
  };

  while (starts.size() > 2) {
    int64_t best_rank = INT64_MAX;
    size_t best_i = SIZE_MAX;
    for (size_t i = 0; i + 2 < starts.size(); i++) {
      int64_t r = rank_of(i, i + 1, i + 2);
      if (r < best_rank) {
        best_rank = r;
        best_i = i;
      }
    }
    if (best_rank == INT64_MAX) break;
    starts.erase(starts.begin() + best_i + 1);
  }
  for (size_t i = 0; i + 1 < starts.size(); i++) {
    const std::string sub = piece.substr(starts[i], starts[i + 1] - starts[i]);
    auto it = enc.ranks.find(sub);
    if (it != enc.ranks.end()) {
      out.push_back(it->second);
    } else if (enc.byte_fallback) {
      for (unsigned char b : sub) out.push_back(static_cast<int>(b));
    }
  }
}

}  // namespace

extern "C" {

void* bpe_create(const char* rank_file_path) {
  auto* enc = new Encoder();
  std::ifstream f(rank_file_path);
  if (!f.good()) {
    delete enc;
    return nullptr;
  }
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty()) continue;
    auto sp = line.find(' ');
    if (sp == std::string::npos) continue;
    enc->ranks.emplace(b64_decode(line.substr(0, sp)),
                       std::stoi(line.substr(sp + 1)));
  }
  return enc;
}

void* bpe_create_byte_fallback() {
  auto* enc = new Encoder();
  enc->byte_fallback = true;
  for (int b = 0; b < 256; b++) {
    enc->ranks.emplace(std::string(1, static_cast<char>(b)), b);
  }
  return enc;
}

int bpe_n_vocab(void* handle) {
  return static_cast<int>(static_cast<Encoder*>(handle)->ranks.size());
}

// Encode text -> ids. Returns the number of ids (may exceed max_out; only
// max_out are written).
int bpe_encode(void* handle, const char* text, int text_len, int* out_ids,
               int max_out) {
  auto* enc = static_cast<Encoder*>(handle);
  std::string s(text, text_len);
  std::vector<int> ids;
  ids.reserve(text_len / 3 + 8);
  if (enc->byte_fallback) {
    for (unsigned char b : s) ids.push_back(static_cast<int>(b));
  } else {
    for (const std::string& piece : pretokenize(s)) {
      bpe_merge(*enc, piece, ids);
    }
  }
  int n = static_cast<int>(ids.size());
  for (int i = 0; i < n && i < max_out; i++) out_ids[i] = ids[i];
  return n;
}

void bpe_free(void* handle) { delete static_cast<Encoder*>(handle); }

}  // extern "C"
