// joingenes — merge several gene sets (GTF) into one consistent set.
//
// Native (C++) counterpart of reference auxprogs/joingenes/*.cpp
// (jg_transcript.h divideInOverlapsAndConquer / selection /
// search_n_destroy_doublings semantics):
//   1. read all transcripts from the --genesets files (with per-file
//      --priorities),
//   2. split them into "overlaps" (connected components of transcripts
//      that share sequence, strand-agnostic interval overlap),
//   3. delete duplicated transcripts, keeping the highest-priority /
//      highest-score variant (search_n_destroy_doublings), and drop
//      transcripts whose CDS chain is a strict sub-chain of another
//      (search_n_destroy_parts),
//   4. selection: within an overlap, emit the best-priority transcripts;
//      contradicting lower-priority ones are discarded unless
//      --alternatives is given,
//   5. write a renumbered GTF (gene/transcript/CDS lines).
//
// Build: g++ -O2 -std=c++17 -o joingenes joingenes.cpp

#include <algorithm>
#include <climits>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <map>
#include <set>
#include <sstream>
#include <string>
#include <vector>

using namespace std;

struct Exon {
    long start, end;
    int frame;          // -1 unknown
    string feature;     // CDS / exon / ...
};

struct Transcript {
    string seqid, source, strand, txid, geneid;
    int priority = 1;
    double score = 0.0;
    vector<Exon> cds;       // CDS chain, sorted by start
    vector<Exon> other;     // non-CDS features (exon, start/stop_codon...)
    long start = -1, end = -1;
    bool dropped = false;

    string cdsKey() const {
        ostringstream os;
        os << seqid << strand;
        for (auto &e : cds) os << ':' << e.start << '-' << e.end;
        return os.str();
    }
};

static vector<string> split(const string &s, char d) {
    vector<string> out;
    string cur;
    for (char c : s) {
        if (c == d) { out.push_back(cur); cur.clear(); }
        else cur += c;
    }
    out.push_back(cur);
    return out;
}

static string attr(const string &attrs, const string &key) {
    // GTF: key "value"; GFF3: key=value
    size_t p = attrs.find(key);
    while (p != string::npos) {
        size_t q = p + key.size();
        while (q < attrs.size() && (attrs[q] == ' ' || attrs[q] == '=' ||
                                    attrs[q] == '"')) q++;
        size_t r = q;
        while (r < attrs.size() && attrs[r] != '"' && attrs[r] != ';') r++;
        return attrs.substr(q, r - q);
    }
    return "";
}

static void readGtf(const string &path, int priority,
                    map<string, Transcript> &txs, int fileIdx) {
    ifstream in(path);
    if (!in) { cerr << "joingenes: cannot read " << path << endl; exit(1); }
    string line;
    while (getline(in, line)) {
        if (line.empty() || line[0] == '#') continue;
        vector<string> f = split(line, '\t');
        if (f.size() < 8) continue;
        const string &feat = f[2];
        if (feat == "gene") continue;
        string tid = attr(f.size() > 8 ? f[8] : "", "transcript_id");
        if (tid.empty()) tid = attr(f.size() > 8 ? f[8] : "", "ID");
        if (tid.empty()) continue;
        string key = to_string(fileIdx) + "|" + tid;
        Transcript &t = txs[key];
        if (t.txid.empty()) {
            t.txid = tid;
            t.seqid = f[0];
            t.source = f[1];
            t.strand = f[6];
            t.priority = priority;
            t.geneid = attr(f.size() > 8 ? f[8] : "", "gene_id");
        }
        if (feat == "transcript" || feat == "mRNA") {
            t.score = atof(f[5].c_str());
            continue;
        }
        Exon e{atol(f[3].c_str()), atol(f[4].c_str()),
               f[7] == "." ? -1 : atoi(f[7].c_str()), feat};
        if (feat == "CDS") t.cds.push_back(e);
        else t.other.push_back(e);
    }
}

static void finalize(Transcript &t) {
    sort(t.cds.begin(), t.cds.end(),
         [](const Exon &a, const Exon &b) { return a.start < b.start; });
    sort(t.other.begin(), t.other.end(),
         [](const Exon &a, const Exon &b) { return a.start < b.start; });
    t.start = LONG_MAX; t.end = -1;
    for (auto &e : t.cds) { t.start = min(t.start, e.start);
                            t.end = max(t.end, e.start > e.end ? e.start : e.end); }
    for (auto &e : t.other) { t.start = min(t.start, e.start);
                              t.end = max(t.end, e.end); }
}

static const int MIN_INTRON = 20;   // reference joingenes.cpp:200

static bool hasFeature(const Transcript &t, const char *name) {
    for (auto &e : t.other) if (e.feature == name) return true;
    return false;
}

// 5' / 3' translation completeness from start/stop codon features
static bool tlComplete5(const Transcript &t) { return hasFeature(t, "start_codon"); }
static bool tlComplete3(const Transcript &t) { return hasFeature(t, "stop_codon"); }

// reference isCombinable (jg_transcript.cpp): can the boundary-truncated
// acceptor t1 be continued by donor t2 on the genomic side `frontSide`?
// Returns the fitting case 1..4, 0 if not combinable.
static int isCombinable(const Transcript &t1, const Transcript &t2,
                        bool frontSide) {
    if (t1.cds.empty() || t2.cds.empty()) return 0;
    bool ovl = t1.seqid == t2.seqid && t1.start <= t2.end &&
               t2.start <= t1.end;
    if (!ovl) {
        // non-overlapping: only within 5 kb of each other (reference
        // boundary-gap condition)
        long gap = frontSide ? t1.start - t2.end : t2.start - t1.end;
        if (gap < 0 || gap > 5000) return 0;
    }
    if (!frontSide) {
        const Exon &last = t1.cds.back();
        for (auto &e : t2.cds) {
            if (last.end >= e.start && last.end <= e.end) {
                if (last.frame == -1 && e.frame == -1) return 1;
                if ((last.frame == -1) != (e.frame == -1)) return 0;
                if (t1.strand == "+" &&
                    ((3 - ((last.end - last.start) - last.frame) % 3) % 3)
                    == ((3 - ((last.end - e.start) - e.frame) % 3) % 3))
                    return 1;
                if (t1.strand == "-" && last.frame ==
                    (3 - ((e.end - last.end) - e.frame) % 3) % 3)
                    return 1;
                return 0;
            }
            if (last.end <= e.start - MIN_INTRON) {
                if (last.frame == -1 && e.frame == -1) return 2;
                if ((last.frame == -1) != (e.frame == -1)) return 0;
                if (t1.strand == "+" && e.frame ==
                    (3 - ((last.end - last.start + 1) - last.frame) % 3) % 3)
                    return 2;
                if (t1.strand == "-" && last.frame ==
                    (3 - ((e.end - e.start + 1) - e.frame) % 3) % 3)
                    return 2;
                return 0;
            }
        }
    } else {
        const Exon &first = t1.cds.front();
        for (auto it = t2.cds.rbegin(); it != t2.cds.rend(); ++it) {
            const Exon &e = *it;
            if (first.start >= e.start && first.start <= e.end) {
                if (first.frame == -1 && e.frame == -1) return 3;
                if ((first.frame == -1) != (e.frame == -1)) return 0;
                if (t1.strand == "-" &&
                    ((3 - ((first.end - first.start) - first.frame) % 3) % 3)
                    == ((3 - ((e.end - first.start) - e.frame) % 3) % 3))
                    return 3;
                if (t1.strand == "+" && first.frame ==
                    (3 - ((first.start - e.start) - e.frame) % 3) % 3)
                    return 3;
                return 0;
            }
            if (first.start >= e.end + MIN_INTRON) {
                if (first.frame == -1 && e.frame == -1) return 4;
                if ((first.frame == -1) != (e.frame == -1)) return 0;
                if (t1.strand == "-" && e.frame ==
                    (3 - ((first.end - first.start + 1) - first.frame) % 3) % 3)
                    return 4;
                if (t1.strand == "+" && first.frame ==
                    (3 - ((e.end - e.start + 1) - e.frame) % 3) % 3)
                    return 4;
                return 0;
            }
        }
    }
    return 0;
}

// reference joining(): build the joined transcript (cases 1..4).  The
// acceptor's truncated boundary exon is kept as-is; the donor's exons
// beyond it are transferred, and the donor's start/stop codon features
// on the joined side come along.
static Transcript joinTranscripts(const Transcript &acc,
                                  const Transcript &don, int fittingCase) {
    Transcript nt = acc;
    nt.txid = acc.txid + "_" + don.txid;
    long lastPos = acc.cds.back().end;
    long firstPos = acc.cds.front().start;
    if (fittingCase == 1 || fittingCase == 2) {
        bool adding = false;
        for (auto &e : don.cds) {
            if (fittingCase == 2)
                adding = adding || lastPos <= e.start - MIN_INTRON;
            if (adding) nt.cds.push_back(e);
            if (fittingCase == 1 && lastPos >= e.start && lastPos <= e.end) {
                if (nt.strand == "-") nt.cds.back().frame = e.frame;
                adding = true;
            }
        }
        // 3'-side features of the donor (stop codon etc. beyond lastPos)
        for (auto &e : don.other)
            if (e.start > lastPos) nt.other.push_back(e);
    } else {
        vector<Exon> pre;
        for (auto &e : don.cds) {
            if (fittingCase == 3 &&
                firstPos >= e.start && firstPos <= e.end) {
                if (nt.strand == "+") nt.cds.front().frame = e.frame;
                break;
            }
            if (fittingCase == 4 && e.end > firstPos - MIN_INTRON) break;
            pre.push_back(e);
        }
        nt.cds.insert(nt.cds.begin(), pre.begin(), pre.end());
        for (auto &e : don.other)
            if (e.end < firstPos) nt.other.push_back(e);
    }
    finalize(nt);
    return nt;
}

// is a's CDS chain a contiguous sub-chain of b's (same internal
// boundaries)?  reference search_n_destroy_parts
static bool isSubChain(const Transcript &a, const Transcript &b) {
    if (a.seqid != b.seqid || a.strand != b.strand) return false;
    if (a.cds.empty() || a.cds.size() >= b.cds.size()) return false;
    for (size_t off = 0; off + a.cds.size() <= b.cds.size(); off++) {
        bool ok = true;
        for (size_t i = 0; i < a.cds.size() && ok; i++) {
            const Exon &x = a.cds[i], &y = b.cds[off + i];
            bool first = (i == 0), last = (i + 1 == a.cds.size());
            bool firstb = (off + i == 0), lastb = (off + i + 1 == b.cds.size());
            // internal boundaries must match exactly; terminal ones may
            // lie within the covering exon
            bool sOk = (first && !firstb) ? (x.start >= y.start)
                                          : (x.start == y.start);
            bool eOk = (last && !lastb) ? (x.end <= y.end)
                                        : (x.end == y.end);
            ok = sOk && eOk;
        }
        if (ok) return true;
    }
    return false;
}

int main(int argc, char **argv) {
    vector<string> files;
    vector<int> priorities;
    string outPath = "/dev/stdout";
    bool alternatives = false;
    bool join = true;                  // --nojoin disables (reference -j)
    for (int i = 1; i < argc; i++) {
        string a = argv[i];
        auto val = [&](const char *) -> string {
            size_t eq = a.find('=');
            if (eq != string::npos) return a.substr(eq + 1);
            return (i + 1 < argc) ? string(argv[++i]) : string();
        };
        if (a.rfind("--genesets", 0) == 0 || a == "-g")
            for (auto &p : split(val("g"), ',')) files.push_back(p);
        else if (a.rfind("--priorities", 0) == 0 || a == "-p")
            for (auto &p : split(val("p"), ','))
                priorities.push_back(atoi(p.c_str()));
        else if (a.rfind("--output", 0) == 0 || a == "-o")
            outPath = val("o");
        else if (a.rfind("--alternatives", 0) == 0 || a == "-a")
            alternatives = true;
        else if (a.rfind("--nojoin", 0) == 0 || a == "-j")
            join = false;
        else if (a == "-h" || a == "--help") {
            cout << "usage: joingenes -g set1.gtf,set2.gtf [-p 2,1] "
                    "[-o out.gtf] [--alternatives]\n";
            return 0;
        }
    }
    if (files.empty()) { cerr << "joingenes: no --genesets\n"; return 1; }
    while (priorities.size() < files.size()) priorities.push_back(1);

    map<string, Transcript> txmap;
    for (size_t i = 0; i < files.size(); i++)
        readGtf(files[i], priorities[i], txmap, (int)i);
    vector<Transcript> txs;
    for (auto &kv : txmap) { finalize(kv.second); txs.push_back(kv.second); }
    auto bySeqStart = [](const Transcript &a, const Transcript &b) {
        if (a.seqid != b.seqid) return a.seqid < b.seqid;
        return a.start < b.start;
    };
    sort(txs.begin(), txs.end(), bySeqStart);

    // ---- joining of boundary-split transcripts -------------------------
    // reference joinCall (jg_transcript.cpp:77): transcripts missing a
    // stop (side '3') or start ('5') codon are continued by a completing
    // donor on the same strand when the truncated boundary CDS is frame-
    // compatible with a donor CDS (isCombinable cases 1-4); the joined
    // copy is added, the truncated parts later fall to the sub-chain /
    // duplicate removal.  '3' runs before '5' so a both-sides-truncated
    // middle piece can be completed in two steps.
    if (join) {
        for (char side : {'3', '5'}) {
            vector<Transcript> added;
            for (auto &acc : txs) {
                if (acc.cds.empty()) continue;
                bool complete = (side == '3') ? tlComplete3(acc)
                                              : tlComplete5(acc);
                if (complete) continue;
                for (auto &don : txs) {
                    if (&don == &acc || don.cds.empty()) continue;
                    if (don.seqid != acc.seqid || don.strand != acc.strand)
                        continue;
                    bool donOk = (side == '3') ? tlComplete3(don)
                                               : tlComplete5(don);
                    if (!donOk) continue;
                    bool frontSide =
                        (acc.strand == "+" && side == '5') ||
                        (acc.strand == "-" && side == '3');
                    int fc = isCombinable(acc, don, frontSide);
                    if (fc)
                        added.push_back(joinTranscripts(acc, don, fc));
                }
            }
            for (auto &t : added) txs.push_back(t);
            sort(txs.begin(), txs.end(), bySeqStart);
        }
    }

    // ---- overlap components (per seqid, interval overlap) --------------
    vector<vector<int>> overlaps;
    long curEnd = -1;
    string curSeq;
    for (size_t i = 0; i < txs.size(); i++) {
        if (txs[i].seqid != curSeq || txs[i].start > curEnd) {
            overlaps.emplace_back();
            curSeq = txs[i].seqid;
            curEnd = txs[i].end;
        }
        overlaps.back().push_back((int)i);
        curEnd = max(curEnd, txs[i].end);
    }

    // ---- dedup + sub-chain removal + selection per overlap -------------
    for (auto &ov : overlaps) {
        // duplicates: same CDS chain -> keep best (priority, then score)
        map<string, int> best;
        for (int i : ov) {
            string k = txs[i].cdsKey();
            auto it = best.find(k);
            if (it == best.end()) best[k] = i;
            else {
                int j = it->second;
                bool better = txs[i].priority > txs[j].priority ||
                    (txs[i].priority == txs[j].priority &&
                     txs[i].score > txs[j].score);
                if (better) { txs[j].dropped = true; best[k] = i; }
                else txs[i].dropped = true;
            }
        }
        // sub-chains
        for (int i : ov) if (!txs[i].dropped)
            for (int j : ov) if (i != j && !txs[j].dropped &&
                                 txs[j].priority <= txs[i].priority &&
                                 isSubChain(txs[j], txs[i]))
                txs[j].dropped = true;
        // selection: without --alternatives, discard lower-priority
        // transcripts that contradict (overlap on the same strand with
        // different CDS) a kept higher-priority one
        if (!alternatives) {
            int maxPrio = 0;
            for (int i : ov) if (!txs[i].dropped)
                maxPrio = max(maxPrio, txs[i].priority);
            for (int i : ov) if (!txs[i].dropped &&
                                 txs[i].priority < maxPrio) {
                for (int j : ov) {
                    if (txs[j].dropped || txs[j].priority != maxPrio)
                        continue;
                    if (txs[i].strand == txs[j].strand &&
                        txs[i].start <= txs[j].end &&
                        txs[j].start <= txs[i].end) {
                        txs[i].dropped = true;
                        break;
                    }
                }
            }
        }
    }

    // ---- output (renumbered, reference jg_ios output format) -----------
    ofstream out(outPath);
    int g = 0;
    for (auto &ov : overlaps) {
        // group kept transcripts into genes by overlap on same strand
        vector<int> kept;
        for (int i : ov) if (!txs[i].dropped) kept.push_back(i);
        if (kept.empty()) continue;
        g++;
        string gid = "jg" + to_string(g);
        long gs = LONG_MAX, ge = -1;
        for (int i : kept) { gs = min(gs, txs[i].start);
                             ge = max(ge, txs[i].end); }
        out << txs[kept[0]].seqid << "\tjoingenes\tgene\t" << gs << "\t"
            << ge << "\t.\t" << txs[kept[0]].strand << "\t.\t" << gid
            << "\n";
        int tn = 0;
        for (int i : kept) {
            tn++;
            Transcript &t = txs[i];
            string tid = gid + ".t" + to_string(tn);
            out << t.seqid << "\t" << t.source << "\ttranscript\t"
                << t.start << "\t" << t.end << "\t" << t.score << "\t"
                << t.strand << "\t.\t" << tid << "\n";
            auto emit = [&](const Exon &e) {
                out << t.seqid << "\t" << t.source << "\t" << e.feature
                    << "\t" << e.start << "\t" << e.end << "\t.\t"
                    << t.strand << "\t"
                    << (e.frame < 0 ? string(".") : to_string(e.frame))
                    << "\ttranscript_id \"" << tid << "\"; gene_id \""
                    << gid << "\";\n";
            };
            for (auto &e : t.other) emit(e);
            for (auto &e : t.cds) emit(e);
        }
    }
    return 0;
}
