#include "g2p.h"

#include <cctype>
#include <cstring>

namespace t2v {
namespace {

// Rule: left-context pattern, target letters, right-context pattern,
// phoneme output (space-separated ARPABET, "" = silent).
//
// Pattern metacharacters (the classic letter-to-sound formalism):
//   ' '  word boundary
//   '#'  one or more vowel letters (a e i o u y)
//   ':'  zero or more consonant letters
//   '^'  exactly one consonant letter
//   '.'  one voiced consonant (b d g j l m n r v w z)
//   '+'  one front vowel letter (e i y)
//   '%'  a suffix: ER E ES ED ING ELY
// Plain letters match themselves. Rules for a letter are tried in order;
// the first whose three parts all match wins.
struct Rule {
  const char* left;
  const char* target;
  const char* right;
  const char* phones;
};

bool IsVowel(char c) {
  return c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y';
}
bool IsConsonant(char c) { return std::isalpha(c) && !IsVowel(c); }
bool IsVoiced(char c) { return std::strchr("bdgjlmnrvwz", c) != nullptr; }
bool IsFront(char c) { return c == 'e' || c == 'i' || c == 'y'; }

// The rule table. Original and intentionally compact: the dictionary
// handles common words; this is the OOV fallback. Ordered most-specific
// first within each letter.
const Rule kRules[] = {
    // --- a ---
    {" ", "are", " ", "AA R"},
    {" ", "a", " ", "AH"},
    {"#^:", "a", " ", "AH"},      // final unstressed a: erica, hyperbola
    {"", "ia", " ", "IY AH"},
    {"", "ian", " ", "IY AH N"},
    {"^", "man", " ", "M AH N"},  // suffix -man: fourman
    {"", "air", "", "EH R"},
    {"", "ar", "o", "AA R"},
    {"", "ar", "", "AA R"},
    {"^", "as", "#", "EY S"},
    {"", "a", "wa", "AH"},
    {"", "aw", "", "AO"},
    {" :", "any", "", "EH N IY"},
    {"", "a", "^+#", "EY"},       // nation, basic
    {"", "ally", "", "AH L IY"},
    {" ", "al", "#", "AH L"},
    {"", "again", "", "AH G EH N"},
    {"#:", "ag", "e", "IH JH"},
    {"", "a", "^+:#", "AE"},
    {" :", "a", "^+ ", "EY"},
    {"", "a", "^%", "EY"},        // -ade, -ake
    {" ", "arr", "", "AH R"},
    {"", "arr", "", "AE R"},
    {" :", "ar", " ", "AA R"},
    {"", "ai", "", "EY"},
    {"", "ay", "", "EY"},
    {"", "au", "", "AO"},
    {"#:", "al", " ", "AH L"},
    {"#:", "als", " ", "AH L Z"},
    {"", "alk", "", "AO K"},
    {"", "al", "^", "AO L"},
    {" :", "able", "", "EY B AH L"},
    {"", "able", "", "AH B AH L"},
    {"", "ang", "+", "EY N JH"},
    {"", "a", "^e ", "EY"},       // cake-type magic e
    {"", "a", "^^e", "AE"},
    {"", "a", "", "AE"},
    // --- b ---
    {" ", "be", "^#", "B IH"},
    {"", "being", "", "B IY IH NG"},
    {" ", "both", " ", "B OW TH"},
    {"", "bb", "", "B"},
    {"", "b", " ", "B"},
    {"m", "b", " ", ""},          // climb, comb
    {"", "b", "", "B"},
    // --- c ---
    {" ", "ch", "^", "K"},        // chrome, christmas
    {"^e", "ch", "", "K"},        // tech
    {"", "ch", "", "CH"},
    {" s", "ci", "#", "S AY"},
    {"", "ci", "a", "SH"},        // special
    {"", "ci", "o", "SH"},
    {"", "ci", "en", "SH"},
    {"", "ck", "", "K"},
    {"", "com", "%", "K AH M"},
    {"", "cc", "+", "K S"},       // accept
    {"", "cc", "", "K"},
    {"", "c", "+", "S"},          // cent, city, cycle
    {"", "c", "", "K"},
    // --- d ---
    {"#:", "ded", " ", "D IH D"},
    {".e", "d", " ", "D"},        // pulled
    {"#^:e", "d", " ", "T"},      // missed, capped
    {" ", "de", "^#", "D IH"},
    {" ", "do", " ", "D UW"},
    {" ", "does", "", "D AH Z"},
    {"", "dd", "", "D"},
    {"", "d", "", "D"},
    // --- e ---
    {"#:", "e", " ", ""},         // silent final e
    {"':^", "e", " ", ""},
    {" :", "e", " ", "IY"},
    {"#", "ed", " ", "D"},
    {"#:", "e", "d ", ""},
    {"", "ev", "er", "EH V"},
    {"", "e", "^%", "IY"},
    {"", "eri", "#", "IY R IY"},
    {"", "eri", "", "EH R IH"},
    {"#:", "er", "#", "ER"},
    {"", "er", "#", "EH R"},
    {"", "er", "", "ER"},
    {" ", "even", "", "IY V EH N"},
    {"#:", "e", "w", ""},
    {"t", "ew", "", "UW"},
    {"s", "ew", "", "UW"},
    {"r", "ew", "", "UW"},
    {"d", "ew", "", "UW"},
    {"l", "ew", "", "UW"},
    {"z", "ew", "", "UW"},
    {"n", "ew", "", "UW"},
    {"j", "ew", "", "UW"},
    {"th", "ew", "", "UW"},
    {"ch", "ew", "", "UW"},
    {"sh", "ew", "", "UW"},
    {"", "ew", "", "Y UW"},
    {"", "e", "o", "IY"},
    {"#:s", "es", " ", "IH Z"},
    {"#:c", "es", " ", "IH Z"},
    {"#:g", "es", " ", "IH Z"},
    {"#:z", "es", " ", "IH Z"},
    {"#:x", "es", " ", "IH Z"},
    {"#:j", "es", " ", "IH Z"},
    {"#:ch", "es", " ", "IH Z"},
    {"#:sh", "es", " ", "IH Z"},
    {"#:", "e", "s ", ""},
    {"", "ely", " ", "L IY"},
    {"", "ement", "", "M EH N T"},
    {"", "eful", "", "F UH L"},
    {"", "ee", "", "IY"},
    {"", "earn", "", "ER N"},
    {" ", "ear", "^", "ER"},
    {"", "ead", "", "EH D"},
    {"#:", "ea", " ", "IY AH"},
    {"", "ea", "su", "EH"},
    {"", "ea", "", "IY"},
    {"", "eigh", "", "EY"},
    {"", "ei", "", "IY"},
    {" ", "eye", "", "AY"},
    {"", "ey", "", "IY"},
    {"", "eu", "", "Y UW"},
    {"", "e", "", "EH"},
    // --- f ---
    {"", "ful", "", "F UH L"},
    {"^", "ford", " ", "F ER D"}, // -ford names: bickford
    {"", "ff", "", "F"},
    {"", "f", "", "F"},
    // --- g ---
    {"", "giv", "", "G IH V"},
    {" ", "g", "i^", "G"},
    {"", "ge", "t", "G EH"},
    {"su", "gges", "", "G JH EH S"},
    {"", "gg", "", "G"},
    {" b#", "g", "", "G"},
    {"", "g", "+", "JH"},
    {"", "great", "", "G R EY T"},
    {"#", "gh", "", ""},
    {"", "gh", "", "G"},
    {"", "g", "", "G"},
    // --- h ---
    {" ", "hav", "", "HH AE V"},
    {" ", "here", "", "HH IY R"},
    {" ", "hour", "", "AW ER"},
    {"", "how", "", "HH AW"},
    {"", "h", "#", "HH"},
    {"", "h", "", ""},
    // --- i ---
    {" ", "in", "", "IH N"},
    {" ", "i", " ", "AY"},
    {"", "in", "d", "AY N"},
    {"", "ier", "", "IY ER"},
    {"#:r", "ied", "", "IY D"},
    {"", "ied", " ", "AY D"},
    {"", "ien", "", "IY EH N"},
    {"", "ie", "t", "AY EH"},
    {" :", "i", "%", "AY"},
    {"", "i", "%", "IY"},
    {"", "ie", "", "IY"},
    {"", "i", "^+:#", "IH"},
    {"", "ir", "#", "AY R"},
    {"", "iz", "%", "AY Z"},
    {"", "is", "%", "AY Z"},
    {"", "i", "d%", "AY"},
    {"+^", "i", "^+", "IH"},
    {"", "i", "t%", "AY"},
    {"#^:", "i", "^+", "IH"},
    {"", "i", "^+", "AY"},
    {"", "ir", "", "ER"},
    {"", "igh", "", "AY"},
    {"", "ild", "", "AY L D"},
    {"", "ign", " ", "AY N"},
    {"", "ign", "^", "AY N"},
    {"", "ign", "%", "AY N"},
    {"", "ique", "", "IY K"},
    {"", "i", "^e ", "AY"},       // bite-type magic e
    {"", "i", "", "IH"},
    // --- j ---
    {"", "j", "", "JH"},
    // --- k ---
    {" ", "k", "n", ""},
    {"", "k", "", "K"},
    // --- l ---
    {"", "lo", "c#", "L OW"},
    {"l", "l", "", ""},
    {"#^:", "l", "%", "AH L"},
    {" ", "lead", "", "L IY D"},
    {"", "l", "", "L"},
    // --- m ---
    {"", "mov", "", "M UW V"},
    {"", "mm", "", "M"},
    {"", "m", "", "M"},
    // --- n ---
    {"e", "ng", "+", "N JH"},
    {"", "ng", "r", "NG G"},
    {"", "ng", "#", "NG G"},
    {"", "ngl", "%", "NG G AH L"},
    {"", "ng", "", "NG"},
    {"", "nk", "", "NG K"},
    {" ", "now", " ", "N AW"},
    {"", "news", "", "N UW Z"},
    {"", "nn", "", "N"},
    {"", "n", "", "N"},
    // --- o ---
    {"", "of", " ", "AH V"},
    {"", "orough", "", "ER OW"},
    {"#:", "or", " ", "ER"},
    {"#:", "ors", " ", "ER Z"},
    {"", "or", "", "AO R"},
    {" ", "one", "", "W AH N"},
    {"", "ow", " ", "OW"},
    {"", "ow", "n", "AW"},
    {"", "ow", "", "OW"},
    {" ", "over", "", "OW V ER"},
    {"", "ov", "", "AH V"},
    {"", "o", "^%", "OW"},
    {"", "o", "^en", "OW"},
    {"", "o", "^i#", "OW"},
    {"", "ol", "d", "OW L"},
    {"", "ought", "", "AO T"},
    {"", "ough", "", "AH F"},
    {" ", "ou", "", "AW"},
    {"h", "ou", "s#", "AW"},
    {"", "ous", "", "AH S"},
    {"", "our", "", "AO R"},
    {"", "ould", "", "UH D"},
    {"^", "ou", "^l", "AH"},
    {"", "oup", "", "UW P"},
    {"", "ou", "", "AW"},
    {"", "oy", "", "OY"},
    {"", "oing", "", "OW IH NG"},
    {"", "oi", "", "OY"},
    {"", "oor", "", "AO R"},
    {"", "ook", "", "UH K"},
    {"", "ood", "", "UH D"},
    {"", "oo", "", "UW"},
    {"", "o", "e", "OW"},
    {"", "o", " ", "OW"},
    {"", "oa", "", "OW"},
    {" ", "only", "", "OW N L IY"},
    {" ", "once", "", "W AH N S"},
    {"", "on't", "", "OW N T"},
    {"c", "o", "n", "AA"},
    {"", "o", "ng", "AO"},
    {" ^:", "o", "n", "AH"},
    {"i", "on", "", "AH N"},
    {"#:", "on", " ", "AH N"},
    {"#^", "on", "", "AH N"},
    {"", "o", "st ", "OW"},
    {"", "of", "^", "AO F"},
    {"", "other", "", "AH DH ER"},
    {"", "oss", " ", "AO S"},
    {"#^:", "om", "", "AH M"},
    {"", "o", "", "AA"},
    // --- p ---
    {"", "ph", "", "F"},
    {"", "peop", "", "P IY P"},
    {"", "pow", "", "P AW"},
    {"", "put", " ", "P UH T"},
    {"", "pp", "", "P"},
    {" ", "p", "s", ""},          // psalm
    {"", "p", "", "P"},
    // --- q ---
    {"", "quar", "", "K W AO R"},
    {"", "qu", "", "K W"},
    {"", "q", "", "K"},
    // --- r ---
    {" ", "re", "^#", "R IY"},
    {"", "rr", "", "R"},
    {"", "r", "", "R"},
    // --- s ---
    {"", "sh", "", "SH"},
    {"#", "sion", "", "ZH AH N"},
    {"", "some", "", "S AH M"},
    {"#", "sur", "#", "ZH ER"},
    {"", "sur", "#", "SH ER"},
    {"#", "su", "#", "ZH UW"},
    {"#", "ssu", "#", "SH UW"},
    {"#", "sed", " ", "Z D"},
    {"#", "s", "#", "Z"},
    {"", "said", "", "S EH D"},
    {"^", "sion", "", "SH AH N"},
    {"", "ss", "", "S"},
    {".", "s", " ", "Z"},
    {"#:.e", "s", " ", "Z"},
    {"#^:##", "s", " ", "Z"},
    {"#^:#", "s", " ", "S"},
    {"u", "s", " ", "S"},
    {" :#", "s", " ", "Z"},
    {" ", "sch", "", "S K"},
    {"", "s", "c+", ""},
    {"#", "sm", "", "Z M"},
    {"#", "sn", "'", "Z AH N"},
    {"", "s", "", "S"},
    // --- t ---
    {" ", "the", " ", "DH AH"},
    {"", "to", " ", "T UW"},
    {"", "that", " ", "DH AE T"},
    {" ", "this", " ", "DH IH S"},
    {" ", "they", "", "DH EY"},
    {" ", "there", "", "DH EH R"},
    {"", "ther", "", "DH ER"},
    {"", "their", "", "DH EH R"},
    {" ", "than", " ", "DH AE N"},
    {" ", "them", " ", "DH EH M"},
    {"", "these", " ", "DH IY Z"},
    {" ", "then", "", "DH EH N"},
    {"", "through", "", "TH R UW"},
    {"", "those", "", "DH OW Z"},
    {"", "though", " ", "DH OW"},
    {" ", "thus", "", "DH AH S"},
    {"", "th", "", "TH"},
    {"#:", "ted", " ", "T IH D"},
    {"s", "ti", "#n", "CH"},
    {"", "ti", "o", "SH"},
    {"", "ti", "a", "SH"},
    {"", "tien", "", "SH AH N"},
    {"", "tur", "#", "CH ER"},
    {"", "tu", "a", "CH UW"},
    {" ", "two", "", "T UW"},
    {"", "tt", "", "T"},
    {"", "t", "", "T"},
    // --- u ---
    {" ", "un", "i", "Y UW N"},
    {" ", "un", "", "AH N"},
    {" ", "upon", "", "AH P AO N"},
    {"t", "ur", "#", "UH R"},
    {"s", "ur", "#", "UH R"},
    {"r", "ur", "#", "UH R"},
    {"d", "ur", "#", "JH ER"},
    {"l", "ur", "#", "Y ER"},
    {"z", "ur", "#", "Y ER"},
    {"n", "ur", "#", "Y ER"},
    {"j", "ur", "#", "ER"},
    {"th", "ur", "#", "ER"},
    {"ch", "ur", "#", "ER"},
    {"sh", "ur", "#", "ER"},
    {"", "ur", "#", "Y UH R"},
    {"", "ur", "", "ER"},
    {"", "u", "^ ", "AH"},
    {"", "u", "^^", "AH"},
    {"", "uy", "", "AY"},
    {" g", "u", "#", ""},
    {"g", "u", "%", ""},
    {"g", "u", "#", "W"},
    {"#n", "u", "", "Y UW"},
    {"t", "u", "", "UW"},
    {"s", "u", "", "UW"},
    {"r", "u", "", "UW"},
    {"d", "u", "", "UW"},
    {"l", "u", "", "UW"},
    {"z", "u", "", "UW"},
    {"n", "u", "", "UW"},
    {"j", "u", "", "UW"},
    {"th", "u", "", "UW"},
    {"ch", "u", "", "UW"},
    {"sh", "u", "", "UW"},
    {"", "u", "", "Y UW"},
    // --- v ---
    {"", "view", "", "V Y UW"},
    {"", "v", "", "V"},
    // --- w ---
    {" ", "were", "", "W ER"},
    {"", "wa", "s", "W AA"},
    {"", "wa", "t", "W AA"},
    {"", "where", "", "W EH R"},
    {"", "what", "", "W AA T"},
    {"", "whol", "", "HH OW L"},
    {"", "who", "", "HH UW"},
    {"", "wh", "", "W"},
    {"^", "ward", "", "W ER D"},  // -ward(s): backwards
    {"", "war", "", "W AO R"},
    {"", "wor", "^", "W ER"},
    {"", "wr", "", "R"},
    {"", "w", "", "W"},
    // --- x ---
    {" ", "x", "", "Z"},
    {"", "x", "", "K S"},
    // --- y ---
    {"", "young", "", "Y AH NG"},
    {" ", "you", "", "Y UW"},
    {" ", "yes", "", "Y EH S"},
    {" ", "y", "", "Y"},
    {"#^:", "y", " ", "IY"},
    {"#^:", "y", "i", "IY"},
    {" :", "y", " ", "AY"},
    {" :", "y", "#", "AY"},
    {" :", "y", "^+:#", "IH"},
    {" :", "y", "^#", "AY"},
    {"", "y", "", "IH"},
    // --- z ---
    {"", "zz", "", "Z"},
    {"", "z", "", "Z"},
};

// Matches `pat` against the word to the LEFT of position `pos`
// (right-to-left).
bool MatchLeft(const std::string& w, int pos, const char* pat);
// Matches `pat` against the word starting at `pos` (left-to-right).
bool MatchRight(const std::string& w, int pos, const char* pat);

bool MatchLeft(const std::string& w, int pos, const char* pat) {
  const int n = static_cast<int>(std::strlen(pat));
  if (n == 0) return true;
  const char c = pat[n - 1];
  // Build the prefix pattern without the last char.
  std::string rest(pat, n - 1);
  const char wc = pos > 0 ? w[pos - 1] : ' ';
  switch (c) {
    case ' ':
      return wc == ' ' && MatchLeft(w, pos > 0 ? pos - 1 : 0, rest.c_str());
    case '#': {  // one or more vowels
      if (!IsVowel(wc)) return false;
      int p = pos - 1;
      while (p > 0 && IsVowel(w[p - 1])) {
        if (MatchLeft(w, p, rest.c_str())) return true;
        --p;
      }
      return MatchLeft(w, p, rest.c_str());
    }
    case ':': {  // zero or more consonants
      int p = pos;
      if (MatchLeft(w, p, rest.c_str())) return true;
      while (p > 0 && IsConsonant(w[p - 1])) {
        --p;
        if (MatchLeft(w, p, rest.c_str())) return true;
      }
      return false;
    }
    case '^':
      return IsConsonant(wc) && MatchLeft(w, pos - 1, rest.c_str());
    case '.':
      return IsVoiced(wc) && MatchLeft(w, pos - 1, rest.c_str());
    case '+':
      return IsFront(wc) && MatchLeft(w, pos - 1, rest.c_str());
    default:
      return wc == c && MatchLeft(w, pos - 1, rest.c_str());
  }
}

bool MatchRight(const std::string& w, int pos, const char* pat) {
  if (*pat == '\0') return true;
  const int len = static_cast<int>(w.size());
  const char wc = pos < len ? w[pos] : ' ';
  switch (*pat) {
    case ' ':
      return wc == ' ' || pos >= len ? MatchRight(w, pos + 1, pat + 1) : false;
    case '#': {
      if (!IsVowel(wc)) return false;
      int p = pos + 1;
      while (p < len && IsVowel(w[p])) {
        if (MatchRight(w, p, pat + 1)) return true;
        ++p;
      }
      return MatchRight(w, p, pat + 1);
    }
    case ':': {
      int p = pos;
      if (MatchRight(w, p, pat + 1)) return true;
      while (p < len && IsConsonant(w[p])) {
        ++p;
        if (MatchRight(w, p, pat + 1)) return true;
      }
      return false;
    }
    case '^':
      return IsConsonant(wc) && MatchRight(w, pos + 1, pat + 1);
    case '.':
      return IsVoiced(wc) && MatchRight(w, pos + 1, pat + 1);
    case '+':
      return IsFront(wc) && MatchRight(w, pos + 1, pat + 1);
    case '%': {  // suffix: er | ing | ely | e | es | ed
      static const char* kSuffixes[] = {"ing", "ely", "er", "es", "ed", "e"};
      for (const char* suf : kSuffixes) {
        const int sl = static_cast<int>(std::strlen(suf));
        if (pos + sl <= len && w.compare(pos, sl, suf) == 0 &&
            MatchRight(w, pos + sl, pat + 1)) {
          return true;
        }
      }
      return false;
    }
    default:
      return wc == *pat && MatchRight(w, pos + 1, pat + 1);
  }
}

void AppendPhones(const char* phones, std::vector<std::string>* out) {
  std::string cur;
  for (const char* p = phones;; ++p) {
    if (*p == ' ' || *p == '\0') {
      if (!cur.empty()) out->push_back(cur);
      cur.clear();
      if (*p == '\0') break;
    } else {
      cur.push_back(*p);
    }
  }
}

}  // namespace

std::vector<std::string> GraphemeToPhoneme(const std::string& word) {
  // Normalise: lowercase letters, boundaries as spaces.
  std::string w = " ";
  for (char c : word) {
    if (std::isalpha(static_cast<unsigned char>(c))) {
      w.push_back(static_cast<char>(std::tolower(c)));
    } else if (c == '\'') {
      w.push_back(c);
    }
  }
  w.push_back(' ');

  std::vector<std::string> out;
  int pos = 1;  // skip leading boundary
  const int end = static_cast<int>(w.size()) - 1;
  while (pos < end) {
    bool matched = false;
    for (const Rule& r : kRules) {
      const int tl = static_cast<int>(std::strlen(r.target));
      if (r.target[0] != w[pos]) continue;
      if (pos + tl > end) continue;
      if (w.compare(pos, tl, r.target) != 0) continue;
      if (!MatchLeft(w, pos, r.left)) continue;
      if (!MatchRight(w, pos + tl, r.right)) continue;
      AppendPhones(r.phones, &out);
      pos += tl;
      matched = true;
      break;
    }
    if (!matched) ++pos;  // unknown char: skip
  }
  return out;
}

}  // namespace t2v
