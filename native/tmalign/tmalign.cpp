// TM-align-compatible structural aligner (C++17, no external deps).
//
// In-repo replacement for the external TMalign binary the reference shells
// out to (`/root/reference/ProteinReDiff/tmalign.py:31-40`; built from the
// Zhang-group TMalign.cpp per its README.md:44-51). Implements the TM-align
// method (Zhang & Skolnick, NAR 33:2302, 2005) from the paper's description:
//
//   * initial alignments: gapless threading + secondary-structure DP +
//     hybrid SS/distance DP
//   * TM-score rotation search: iterative fragment superposition (Kabsch)
//     with distance-cutoff extension
//   * Needleman-Wunsch DP on the TM-score matrix, iterated to convergence
//
// CLI contract (the subset the Python wrapper uses):
//   TMalign prb.pdb ref.pdb -outfmt 2 [-mirror 1] -m matrix.txt
//
//   -outfmt 2 : one header line + one tab-separated data line whose
//               4th field is TM2 (TM-score normalized by chain 2 length)
//   -m FILE   : rotation matrix file; lines 3-5 hold "m t[m] u[m][0..2]"
//               such that  x' = t + u * x  maps chain 1 onto chain 2
//   -mirror 1 : align the mirror image (z -> -z) of chain 1
//
// This is an independent implementation: no code from TMalign.cpp.

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

using std::string;
using std::vector;

using Vec3 = std::array<double, 3>;
using Mat3 = std::array<std::array<double, 3>, 3>;

// ----------------------------------------------------------------- PDB I/O
struct Chain {
  vector<Vec3> ca;
  vector<char> aa;  // one-letter codes for sequence identity columns
};

static char three_to_one(const string& r) {
  static const struct { const char* three; char one; } tab[] = {
      {"ALA", 'A'}, {"ARG", 'R'}, {"ASN", 'N'}, {"ASP", 'D'}, {"CYS", 'C'},
      {"GLN", 'Q'}, {"GLU", 'E'}, {"GLY", 'G'}, {"HIS", 'H'}, {"ILE", 'I'},
      {"LEU", 'L'}, {"LYS", 'K'}, {"MET", 'M'}, {"PHE", 'F'}, {"PRO", 'P'},
      {"SER", 'S'}, {"THR", 'T'}, {"TRP", 'W'}, {"TYR", 'Y'}, {"VAL", 'V'}};
  for (const auto& e : tab)
    if (r == e.three) return e.one;
  return 'X';
}

// Reads CA atoms of the first chain of the first model (TMalign default
// -ter 2 semantics).
static Chain read_chain(const string& path) {
  std::ifstream f(path);
  if (!f) {
    std::cerr << "Cannot open " << path << "\n";
    std::exit(1);
  }
  Chain c;
  string line;
  char chain_id = 0;
  bool have_chain = false;
  while (std::getline(f, line)) {
    if (line.rfind("ENDMDL", 0) == 0) break;
    if (line.rfind("TER", 0) == 0 && have_chain) break;
    if (line.rfind("ATOM", 0) != 0 || line.size() < 54) continue;
    string name = line.substr(12, 4);
    // strip spaces
    name.erase(std::remove(name.begin(), name.end(), ' '), name.end());
    if (name != "CA") continue;
    char altloc = line[16];
    if (altloc != ' ' && altloc != 'A') continue;
    char cid = line[21];
    if (!have_chain) {
      chain_id = cid;
      have_chain = true;
    } else if (cid != chain_id) {
      break;
    }
    Vec3 p = {std::stod(line.substr(30, 8)), std::stod(line.substr(38, 8)),
              std::stod(line.substr(46, 8))};
    c.ca.push_back(p);
    c.aa.push_back(three_to_one(line.substr(17, 3)));
  }
  return c;
}

// ------------------------------------------------------------------ Kabsch
// Superposes x onto y (aligned pairs), returning rotation u and shift t
// with det(u) = +1:  y ~ t + u*x.
static void kabsch(const vector<Vec3>& x, const vector<Vec3>& y, Mat3& u,
                   Vec3& t) {
  const size_t n = x.size();
  Vec3 xc = {0, 0, 0}, yc = {0, 0, 0};
  for (size_t i = 0; i < n; ++i)
    for (int k = 0; k < 3; ++k) {
      xc[k] += x[i][k];
      yc[k] += y[i][k];
    }
  for (int k = 0; k < 3; ++k) {
    xc[k] /= n;
    yc[k] /= n;
  }
  // Covariance C = sum (x-xc)(y-yc)^T
  double C[3][3] = {{0}};
  for (size_t i = 0; i < n; ++i)
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b)
        C[a][b] += (x[i][a] - xc[a]) * (y[i][b] - yc[b]);

  // Jacobi eigen-decomposition of C^T C (symmetric 3x3).
  double B[3][3];
  for (int a = 0; a < 3; ++a)
    for (int b = 0; b < 3; ++b) {
      B[a][b] = 0;
      for (int k = 0; k < 3; ++k) B[a][b] += C[k][a] * C[k][b];
    }
  double V[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  for (int sweep = 0; sweep < 50; ++sweep) {
    double off = std::abs(B[0][1]) + std::abs(B[0][2]) + std::abs(B[1][2]);
    if (off < 1e-14) break;
    for (int p = 0; p < 2; ++p)
      for (int q = p + 1; q < 3; ++q) {
        if (std::abs(B[p][q]) < 1e-16) continue;
        double theta = (B[q][q] - B[p][p]) / (2 * B[p][q]);
        double sgn = theta >= 0 ? 1.0 : -1.0;
        double tt = sgn / (std::abs(theta) + std::sqrt(theta * theta + 1));
        double cc = 1.0 / std::sqrt(tt * tt + 1), ss = tt * cc;
        for (int k = 0; k < 3; ++k) {
          double bkp = B[k][p], bkq = B[k][q];
          B[k][p] = cc * bkp - ss * bkq;
          B[k][q] = ss * bkp + cc * bkq;
        }
        for (int k = 0; k < 3; ++k) {
          double bpk = B[p][k], bqk = B[q][k];
          B[p][k] = cc * bpk - ss * bqk;
          B[q][k] = ss * bpk + cc * bqk;
          double vkp = V[k][p], vkq = V[k][q];
          V[k][p] = cc * vkp - ss * vkq;
          V[k][q] = ss * vkp + cc * vkq;
        }
      }
  }
  // Sort eigenpairs descending.
  int idx[3] = {0, 1, 2};
  std::sort(idx, idx + 3, [&](int a, int b) { return B[a][a] > B[b][b]; });
  double v[3][3], w[3][3];
  for (int c2 = 0; c2 < 3; ++c2)
    for (int r = 0; r < 3; ++r) v[r][c2] = V[r][idx[c2]];
  // w_i = C v_i / |C v_i|  (the left singular vectors of C)
  for (int c2 = 0; c2 < 3; ++c2) {
    double norm = 0;
    for (int r = 0; r < 3; ++r) {
      w[r][c2] = 0;
      for (int k = 0; k < 3; ++k) w[r][c2] += C[r][k] * v[k][c2];
      norm += w[r][c2] * w[r][c2];
    }
    norm = std::sqrt(norm);
    if (norm > 1e-9)
      for (int r = 0; r < 3; ++r) w[r][c2] /= norm;
  }
  // Ensure right-handed: w2 = w0 x w1, v2 = v0 x v1.
  w[0][2] = w[1][0] * w[2][1] - w[2][0] * w[1][1];
  w[1][2] = w[2][0] * w[0][1] - w[0][0] * w[2][1];
  w[2][2] = w[0][0] * w[1][1] - w[1][0] * w[0][1];
  v[0][2] = v[1][0] * v[2][1] - v[2][0] * v[1][1];
  v[1][2] = v[2][0] * v[0][1] - v[0][0] * v[2][1];
  v[2][2] = v[0][0] * v[1][1] - v[1][0] * v[0][1];
  // C = U_c S V_c^T with w = U_c, v = V_c; the rotation maximizing
  // sum y.(u x) is u = V_c U_c^T  (maps the x frame onto the y frame).
  for (int a = 0; a < 3; ++a)
    for (int b = 0; b < 3; ++b) {
      u[a][b] = 0;
      for (int k = 0; k < 3; ++k) u[a][b] += v[a][k] * w[b][k];
    }
  // t = yc - u xc
  for (int a = 0; a < 3; ++a) {
    t[a] = yc[a];
    for (int k = 0; k < 3; ++k) t[a] -= u[a][k] * xc[k];
  }
}

static inline Vec3 apply(const Mat3& u, const Vec3& t, const Vec3& p) {
  return {t[0] + u[0][0] * p[0] + u[0][1] * p[1] + u[0][2] * p[2],
          t[1] + u[1][0] * p[0] + u[1][1] * p[1] + u[1][2] * p[2],
          t[2] + u[2][0] * p[0] + u[2][1] * p[1] + u[2][2] * p[2]};
}

static inline double dist2(const Vec3& a, const Vec3& b) {
  double dx = a[0] - b[0], dy = a[1] - b[1], dz = a[2] - b[2];
  return dx * dx + dy * dy + dz * dz;
}

// --------------------------------------------------------------- TM pieces
static double tm_d0(int Lnorm) {
  if (Lnorm <= 21) return 0.5;
  double d0 = 1.24 * std::cbrt((double)Lnorm - 15.0) - 1.8;
  return d0 < 0.5 ? 0.5 : d0;
}

struct Result {
  double tm = -1;  // normalized by Lnorm passed to score()
  Mat3 u{};
  Vec3 t{};
};

// TM-score of a fixed alignment under transform (u,t).
static double tm_of_transform(const vector<Vec3>& xa, const vector<Vec3>& ya,
                              const vector<int>& ali, const Mat3& u,
                              const Vec3& t, double d0, int Lnorm) {
  double d0sq = d0 * d0, s = 0;
  for (size_t i = 0; i < ali.size(); ++i) {
    if (ali[i] < 0) continue;
    double dd = dist2(apply(u, t, xa[i]), ya[ali[i]]);
    s += 1.0 / (1.0 + dd / d0sq);
  }
  return s / Lnorm;
}

// TM-score rotation search (Zhang-Skolnick TM-score heuristic): seed on
// sliding windows of the aligned pairs, superpose, extend by distance
// cutoff, iterate; keep the best transform.
static Result tmscore_search(const vector<Vec3>& xa, const vector<Vec3>& ya,
                             const vector<int>& ali, double d0, int Lnorm,
                             int fast = 0) {
  vector<int> ia, ja;
  for (size_t i = 0; i < ali.size(); ++i)
    if (ali[i] >= 0) {
      ia.push_back((int)i);
      ja.push_back(ali[i]);
    }
  const int n_ali = (int)ia.size();
  Result best;
  if (n_ali < 3) return best;

  double d0_search = d0;
  if (d0_search > 8.0) d0_search = 8.0;
  if (d0_search < 4.5) d0_search = 4.5;

  vector<int> L_inis;
  for (int L = n_ali; L >= 4; L /= 2) {
    L_inis.push_back(L);
    if ((int)L_inis.size() >= (fast ? 2 : 6)) break;
  }

  vector<Vec3> xs, ys;
  for (int L_ini : L_inis) {
    int step = std::max(1, (fast ? L_ini : L_ini * 2 / 5));
    for (int start = 0; start + L_ini <= n_ali; start += step) {
      xs.clear();
      ys.clear();
      for (int k = start; k < start + L_ini; ++k) {
        xs.push_back(xa[ia[k]]);
        ys.push_back(ya[ja[k]]);
      }
      Mat3 u;
      Vec3 t;
      kabsch(xs, ys, u, t);
      // Iterative extension.
      double d_cut = d0_search - 1.0;
      for (int it = 0; it < 20; ++it) {
        double sc = tm_of_transform(xa, ya, ali, u, t, d0, Lnorm);
        if (sc > best.tm) {
          best.tm = sc;
          best.u = u;
          best.t = t;
        }
        // Collect pairs within cutoff under current transform.
        xs.clear();
        ys.clear();
        for (int k = 0; k < n_ali; ++k) {
          double dd = dist2(apply(u, t, xa[ia[k]]), ya[ja[k]]);
          if (dd < d_cut * d_cut) {
            xs.push_back(xa[ia[k]]);
            ys.push_back(ya[ja[k]]);
          }
        }
        while ((int)xs.size() < 3 && d_cut < d0_search + 8) {
          d_cut += 0.5;
          xs.clear();
          ys.clear();
          for (int k = 0; k < n_ali; ++k) {
            double dd = dist2(apply(u, t, xa[ia[k]]), ya[ja[k]]);
            if (dd < d_cut * d_cut) {
              xs.push_back(xa[ia[k]]);
              ys.push_back(ya[ja[k]]);
            }
          }
        }
        if ((int)xs.size() < 3) break;
        Mat3 u2;
        Vec3 t2;
        kabsch(xs, ys, u2, t2);
        double delta = 0;
        for (int a = 0; a < 3; ++a) {
          delta += std::abs(t2[a] - t[a]);
          for (int b = 0; b < 3; ++b) delta += std::abs(u2[a][b] - u[a][b]);
        }
        u = u2;
        t = t2;
        if (delta < 1e-6) {
          double sc2 = tm_of_transform(xa, ya, ali, u, t, d0, Lnorm);
          if (sc2 > best.tm) {
            best.tm = sc2;
            best.u = u;
            best.t = t;
          }
          break;
        }
      }
    }
  }
  return best;
}

// Needleman-Wunsch with constant gap penalty (TM-align uses -0.6 for the
// score-matrix rounds, 0 for the secondary-structure round).
static vector<int> nw_dp(const vector<vector<double>>& S, double gap) {
  const int L1 = (int)S.size(), L2 = (int)S[0].size();
  vector<vector<double>> H(L1 + 1, vector<double>(L2 + 1, 0));
  vector<vector<char>> P(L1 + 1, vector<char>(L2 + 1, 0));  // 0 diag 1 up 2 left
  for (int i = 1; i <= L1; ++i) {
    H[i][0] = 0;
    P[i][0] = 1;
  }
  for (int j = 1; j <= L2; ++j) {
    H[0][j] = 0;
    P[0][j] = 2;
  }
  for (int i = 1; i <= L1; ++i)
    for (int j = 1; j <= L2; ++j) {
      double d = H[i - 1][j - 1] + S[i - 1][j - 1];
      double up = H[i - 1][j] + gap;
      double lf = H[i][j - 1] + gap;
      if (d >= up && d >= lf) {
        H[i][j] = d;
        P[i][j] = 0;
      } else if (up >= lf) {
        H[i][j] = up;
        P[i][j] = 1;
      } else {
        H[i][j] = lf;
        P[i][j] = 2;
      }
    }
  vector<int> ali(L1, -1);
  int i = L1, j = L2;
  while (i > 0 && j > 0) {
    if (P[i][j] == 0) {
      ali[i - 1] = j - 1;
      --i;
      --j;
    } else if (P[i][j] == 1) {
      --i;
    } else {
      --j;
    }
  }
  return ali;
}

// Secondary structure assignment from CA distances (TM-align's make_sec
// recipe: helix/strand patterns over i-2..i+2 CA distances).
static vector<char> assign_sec(const vector<Vec3>& ca) {
  const int n = (int)ca.size();
  vector<char> sec(n, 'C');
  auto d = [&](int i, int j) { return std::sqrt(dist2(ca[i], ca[j])); };
  for (int i = 2; i + 2 < n; ++i) {
    double d13 = d(i - 2, i), d14 = d(i - 2, i + 1), d15 = d(i - 2, i + 2);
    double d24 = d(i - 1, i + 1), d25 = d(i - 1, i + 2), d35 = d(i, i + 2);
    auto near = [](double x, double c, double tol) {
      return std::abs(x - c) < tol;
    };
    if (near(d15, 6.37, 2.1) && near(d14, 5.18, 1.42) &&
        near(d25, 5.18, 1.42) && near(d13, 5.45, 2.1) && near(d24, 5.45, 2.1) &&
        near(d35, 5.45, 2.1))
      sec[i] = 'H';
    else if (near(d15, 13.0, 1.42) && near(d14, 10.4, 1.42) &&
             near(d25, 10.4, 1.42) && near(d13, 6.1, 1.42) &&
             near(d24, 6.1, 1.42) && near(d35, 6.1, 1.42))
      sec[i] = 'E';
  }
  return sec;
}

struct Align {
  double tm2 = -1;  // normalized by L2
  double tm1 = -1;
  double rmsd = 0;
  int n_ali = 0;
  int n_ident = 0;
  Mat3 u{};
  Vec3 t{};
  vector<int> ali;
};

static Align run_tmalign(const vector<Vec3>& xa, const vector<char>& xaa,
                         const vector<Vec3>& ya, const vector<char>& yaa) {
  const int L1 = (int)xa.size(), L2 = (int)ya.size();
  const double d0_2 = tm_d0(L2);
  const double d0_1 = tm_d0(L1);

  vector<vector<int>> initials;

  // --- initial 1: gapless threading, scored by plain distance TM
  {
    double best = -1;
    vector<int> best_ali;
    int min_ali = std::max(5, std::min(L1, L2) / 2);
    for (int shift = -(L1 - min_ali); shift <= L2 - min_ali; ++shift) {
      vector<int> ali(L1, -1);
      vector<Vec3> xs, ys;
      for (int i = 0; i < L1; ++i) {
        int j = i + shift;
        if (j >= 0 && j < L2) {
          ali[i] = j;
          xs.push_back(xa[i]);
          ys.push_back(ya[j]);
        }
      }
      if ((int)xs.size() < min_ali) continue;
      Mat3 u;
      Vec3 t;
      kabsch(xs, ys, u, t);
      double sc = tm_of_transform(xa, ya, ali, u, t, d0_2, L2);
      if (sc > best) {
        best = sc;
        best_ali = ali;
      }
    }
    if (!best_ali.empty()) initials.push_back(best_ali);
  }

  // --- initial 2: secondary-structure DP (gap 0, match=1/mismatch=0)
  {
    vector<char> s1 = assign_sec(xa), s2 = assign_sec(ya);
    vector<vector<double>> S(L1, vector<double>(L2));
    for (int i = 0; i < L1; ++i)
      for (int j = 0; j < L2; ++j) S[i][j] = (s1[i] == s2[j]) ? 1.0 : 0.0;
    initials.push_back(nw_dp(S, -0.6));
  }

  // --- refine each initial with score-matrix DP iterations
  Align best;
  for (const auto& init : initials) {
    vector<int> ali = init;
    Result r = tmscore_search(xa, ya, ali, d0_2, L2);
    if (r.tm < 0) continue;
    if (r.tm > best.tm2) {
      best.tm2 = r.tm;
      best.u = r.u;
      best.t = r.t;
      best.ali = ali;
    }
    for (int iter = 0; iter < 20; ++iter) {
      // Score matrix from current transform.
      vector<vector<double>> S(L1, vector<double>(L2));
      double d0sq = d0_2 * d0_2;
      for (int i = 0; i < L1; ++i) {
        Vec3 xp = apply(r.u, r.t, xa[i]);
        for (int j = 0; j < L2; ++j)
          S[i][j] = 1.0 / (1.0 + dist2(xp, ya[j]) / d0sq);
      }
      vector<int> ali2 = nw_dp(S, -0.6);
      if (ali2 == ali) break;
      ali = ali2;
      r = tmscore_search(xa, ya, ali, d0_2, L2, /*fast=*/1);
      if (r.tm > best.tm2) {
        best.tm2 = r.tm;
        best.u = r.u;
        best.t = r.t;
        best.ali = ali;
      }
    }
  }

  // Final full-accuracy search on the best alignment.
  if (!best.ali.empty()) {
    Result r = tmscore_search(xa, ya, best.ali, d0_2, L2);
    if (r.tm > best.tm2) {
      best.tm2 = r.tm;
      best.u = r.u;
      best.t = r.t;
    }
    best.tm1 = tm_of_transform(xa, ya, best.ali, best.u, best.t, d0_1, L1);
    double ss = 0;
    int n = 0, ident = 0;
    for (int i = 0; i < L1; ++i) {
      int j = best.ali[i];
      if (j < 0) continue;
      ss += dist2(apply(best.u, best.t, xa[i]), ya[j]);
      ++n;
      if (xaa[i] == yaa[j]) ++ident;
    }
    best.rmsd = n ? std::sqrt(ss / n) : 0;
    best.n_ali = n;
    best.n_ident = ident;
  }
  return best;
}

int main(int argc, char** argv) {
  string file1, file2, matrix_path;
  int outfmt = 0, mirror = 0;
  vector<string> pos;
  for (int i = 1; i < argc; ++i) {
    string a = argv[i];
    if (a == "-outfmt" && i + 1 < argc)
      outfmt = std::atoi(argv[++i]);
    else if (a == "-m" && i + 1 < argc)
      matrix_path = argv[++i];
    else if (a == "-mirror" && i + 1 < argc)
      mirror = std::atoi(argv[++i]);
    else if (a[0] == '-') {
      ++i;  // ignore unknown flag+value
    } else
      pos.push_back(a);
  }
  if (pos.size() != 2) {
    std::cerr << "Usage: TMalign chain1.pdb chain2.pdb [-outfmt 2] "
                 "[-mirror 1] [-m matrix.txt]\n";
    return 1;
  }
  file1 = pos[0];
  file2 = pos[1];

  Chain c1 = read_chain(file1), c2 = read_chain(file2);
  if (c1.ca.size() < 3 || c2.ca.size() < 3) {
    std::cerr << "Too few CA atoms (chain1=" << c1.ca.size()
              << ", chain2=" << c2.ca.size() << ")\n";
    return 1;
  }
  if (mirror)
    for (auto& p : c1.ca) p[2] = -p[2];

  Align res = run_tmalign(c1.ca, c1.aa, c2.ca, c2.aa);

  const int L1 = (int)c1.ca.size(), L2 = (int)c2.ca.size();
  double id1 = L1 ? (double)res.n_ident / L1 : 0;
  double id2 = L2 ? (double)res.n_ident / L2 : 0;
  double idali = res.n_ali ? (double)res.n_ident / res.n_ali : 0;

  if (outfmt == 2) {
    std::printf(
        "#PDBchain1\tPDBchain2\tTM1\tTM2\tRMSD\tID1\tID2\tIDali\tL1\tL2\t"
        "Lali\n");
    std::printf("%s\t%s\t%.4f\t%.4f\t%.2f\t%.3f\t%.3f\t%.3f\t%d\t%d\t%d\n",
                file1.c_str(), file2.c_str(), res.tm1, res.tm2, res.rmsd, id1,
                id2, idali, L1, L2, res.n_ali);
  } else {
    std::printf("TM-score= %.5f (normalized by length of Chain_1)\n", res.tm1);
    std::printf("TM-score= %.5f (normalized by length of Chain_2)\n", res.tm2);
    std::printf("Aligned length= %d, RMSD= %.2f\n", res.n_ali, res.rmsd);
  }

  if (!matrix_path.empty()) {
    std::ofstream mf(matrix_path);
    mf << " -------- Rotation matrix to rotate Chain_1 to Chain_2 ------\n";
    mf << " m               t[m]        u[m][0]        u[m][1]        "
          "u[m][2]\n";
    char buf[160];
    for (int m = 0; m < 3; ++m) {
      std::snprintf(buf, sizeof(buf),
                    " %d %18.10f %14.10f %14.10f %14.10f\n", m, res.t[m],
                    res.u[m][0], res.u[m][1], res.u[m][2]);
      mf << buf;
    }
    mf << "\n Code for rotating Chain_1 from (x,y,z) to (X,Y,Z):\n";
  }
  return 0;
}
