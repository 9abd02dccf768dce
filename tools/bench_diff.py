#!/usr/bin/env python3
"""Cross-round bench attribution (VERDICT r7 item #2).

Joins two bench records on query name and classifies every delta using the
repo's documented discipline:

  * warm-pass MINIMUM per query (min across all recorded passes) is the
    comparable number — single passes swing up to ~2x on this box
    (BENCH_NOISE_r07.json);
  * a wall-time delta only counts as real if it clears the 2x noise band;
  * a changed plan FINGERPRINT is reported regardless of wall time, because
    fingerprint-equal + inside-band == box noise, by construction.

Accepted record shapes (auto-detected):
  * raw bench stdout object: {"queries": {...}, "queries2": {...}, "plans": {...}, ...}
  * driver record: {"tail": "...", "parsed": {...}|null, ...} — uses "parsed"
    when present, else scans the tail for complete JSON object lines (the
    head of the full record may be truncated away; best effort).

Usage:
  python3 tools/bench_diff.py OLD.json NEW.json \
      [--plans-old BENCH_PLANS_r07.json] [--plans-new BENCH_PLANS_r08.json] \
      [--band 2.0] [-o BENCHDIFF_r08.md]

Plan fingerprints come from each record's own "plans" key when present;
--plans-old/--plans-new supply a fallback record (e.g. the committed
BENCH_PLANS baseline) for records that lack one.
"""
import argparse
import json
import os
import re
import subprocess
import sys


def _json_objects_in(text):
    """Yield every parseable {...} JSON object found on lines of text."""
    for line in text.splitlines():
        line = line.strip()
        # strip sbt logger prefix if present (pre-r8 captures)
        line = re.sub(r"^\[(info|warn|error)\]\s*", "", line)
        if not (line.startswith("{") and line.endswith("}")):
            continue
        try:
            yield json.loads(line)
        except json.JSONDecodeError:
            continue


def load_record(path):
    """Return the richest bench dict recoverable from path."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    # driver wrapper
    best = d.get("parsed") or {}
    if "tail" in d:
        for obj in _json_objects_in(d["tail"]):
            # prefer the object with per-query detail
            if "queries" in obj or not best:
                best = obj
    if not best and "tail" in d:
        # Pre-r8 captures are a mid-line truncation of the one big record —
        # no complete JSON line survives. Recover what we can: every
        # "name":float pair in the fragment is a (query, seconds) sample
        # (plan hashes are strings and don't match; meta keys excluded).
        # A query seen in several pass maps yields several samples; min of
        # all of them IS the warm-min this tool works on.
        meta = {"value", "value2", "value3", "value4", "nq", "sf", "runs"}
        q = {}
        for name, t in re.findall(r'"([A-Za-z_][A-Za-z0-9_]*)":(\d+\.\d+)', d["tail"]):
            if name not in meta:
                q[name] = min(q.get(name, float("inf")), float(t))
        if q:
            best = {"queries": q, "_recovered_from_tail": True}
    if not best:
        sys.exit(f"error: {path}: no parseable bench object (tail truncated?)")
    return best


def warm_min(rec):
    """Per-query min across every queriesN pass map in the record."""
    out = {}
    for key, val in rec.items():
        if not re.fullmatch(r"queries\d*", key) or not isinstance(val, dict):
            continue
        for q, t in val.items():
            if isinstance(t, (int, float)):
                out[q] = min(out.get(q, float("inf")), float(t))
    return out


def shuffle_bytes(rec):
    """Per-query total shuffle bytes (read+write), min across shuffleN pass
    maps (r8+ records; the min is the steady-state pass, free of one-time
    staged-fixture builds). Bytes are near-deterministic — a material move
    here is a plan change even when wall time sits inside the noise band.
    """
    out = {}
    for key, val in rec.items():
        if not re.fullmatch(r"shuffle\d*", key) or not isinstance(val, dict):
            continue
        for q, rw in val.items():
            if isinstance(rw, list) and len(rw) == 2:
                out[q] = min(out.get(q, float("inf")), rw[0] + rw[1])
    return out


def solo_runs(query, sfdir, timeout=2400):
    """Warm-min of a SOLO fresh-JVM rerun of one query (tools.OneQuery) —
    the adjudication control two rounds of BENCH_NOISE addenda were
    hand-running (VERDICT r13 item #5): whole bench SESSIONS on this box
    run up to ~1.4x uniformly hot while same-minute solo controls sit at
    baseline, so an above-band fingerprint-unchanged row is judged by its
    solo number, not its in-session one.
    Returns the list of per-pass seconds ([] on failure)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    try:
        p = subprocess.run(
            [os.path.join(repo, "tools", "run.sh"),
             "graft.tools.OneQuery", query, sfdir],
            capture_output=True, text=True, env=env, timeout=timeout)
    except subprocess.TimeoutExpired:
        return []
    return [float(m) for m in re.findall(r"run\d+\s*([0-9.]+)s", p.stdout)]


DEFAULT_CANARIES = ["sim_topk", "q_dpp", "q_pagerank"]


def stamp_canaries(record_path, baseline_path, canaries, sfdir, band=1.5):
    """Fresh-JVM solo canaries BEFORE a record becomes the stored headline
    (VERDICT r15 #1: two rounds running, the box's uniform-hot mode was
    stamped as the comparison base and every later diff inherited the
    noise). Each canary reruns solo and compares to the BASELINE record's
    warm-min; if a majority exceed `band`x, the record is marked
    "hot_session": true in place — the differ then tells the next round
    to prefer the last non-hot stamp as its base. Mechanical, not prose:
    the verdict and the per-canary runs are stored in the record itself.
    """
    with open(record_path) as f:
        rec = json.load(f)
    base = warm_min(load_record(baseline_path))
    results, hot_votes, voters = {}, 0, 0
    for q in canaries:
        if q not in base:
            results[q] = {"baseline": None, "solo_runs": [],
                          "verdict": "no baseline"}
            continue
        runs = solo_runs(q, sfdir)
        solo = min(runs) if runs else None
        if solo is None:
            results[q] = {"baseline": base[q], "solo_runs": runs,
                          "verdict": "control failed"}
            continue
        ratio = solo / base[q]
        voters += 1
        hot = ratio > band
        hot_votes += 1 if hot else 0
        results[q] = {"baseline": base[q], "solo_runs": runs,
                      "solo_min": solo, "ratio": round(ratio, 3),
                      "verdict": "hot" if hot else "at baseline"}
        print(f"canary {q}: solo {solo:.3f}s vs baseline {base[q]:.3f}s "
              f"= {ratio:.2f}x -> {'HOT' if hot else 'ok'}")
    hot_session = voters > 0 and hot_votes * 2 > voters
    rec["hot_session"] = hot_session
    rec["canaries"] = {"band": band, "baseline_record": baseline_path,
                       "runs": results}
    with open(record_path, "w") as f:
        # compact separators: the repo's record parsers (ScalingProbe's
        # warmMinsFromBench, the tail-recovery regex) expect the bench
        # main's own no-space JSON
        json.dump(rec, f, separators=(",", ":"))
    print(f"stamped {record_path}: hot_session={hot_session} "
          f"({hot_votes}/{voters} canaries hot, band {band}x)")
    return hot_session


def human(n):
    for unit in ("B", "KB", "MB", "GB"):
        if abs(n) < 1024 or unit == "GB":
            return f"{n:.0f}{unit}" if unit == "B" else f"{n:.1f}{unit}"
        n /= 1024.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--plans-old", help="fallback record holding plans for OLD")
    ap.add_argument("--plans-new", help="fallback record holding plans for NEW")
    ap.add_argument("--band", type=float, default=2.0,
                    help="noise band: ratios inside [1/band, band] are noise (default 2.0)")
    ap.add_argument("-o", "--out", help="write markdown report here (default stdout)")
    ap.add_argument("--scaling", help="SCALING_r{N}.json from tools/ScalingProbe: "
                    "append the measured exponents and flag super-linear "
                    "queries (>1.1) mechanically")
    ap.add_argument("--controls", metavar="SFDIR", nargs="?",
                    const="/root/testdata/sf0.1",
                    help="re-run every above-band fingerprint-unchanged query "
                         "SOLO in a fresh JVM (tools.OneQuery) and add a "
                         "'solo s' column with a mechanical box-noise verdict")
    ap.add_argument("--noise-out",
                    help="write the generated solo-control record (the "
                         "BENCH_NOISE_r{N}.json artifact) here")
    ap.add_argument("--stamp", action="store_true",
                    help="canary-gate mode: rerun the canary queries solo "
                         "fresh-JVM, compare to OLD's warm-mins, and mark "
                         "NEW with hot_session true/false IN PLACE before "
                         "it becomes a stored headline (VERDICT r15 #1). "
                         "No diff is produced.")
    ap.add_argument("--canaries", default=",".join(DEFAULT_CANARIES),
                    help="comma-separated canary queries for --stamp "
                         f"(default: {','.join(DEFAULT_CANARIES)})")
    ap.add_argument("--canary-band", type=float, default=1.5,
                    help="a canary solo above this ratio of its baseline "
                         "warm-min votes hot (default 1.5)")
    ap.add_argument("--sfdir", default="/root/testdata/sf0.1",
                    help="sf dir for --stamp canary runs")
    args = ap.parse_args()

    if args.stamp:
        hot = stamp_canaries(args.new, args.old,
                             [c for c in args.canaries.split(",") if c],
                             args.sfdir, args.canary_band)
        sys.exit(0 if not hot else 3)

    old, new = load_record(args.old), load_record(args.new)
    plans_old = old.get("plans") or (load_record(args.plans_old).get("plans") if args.plans_old else {}) or {}
    plans_new = new.get("plans") or (load_record(args.plans_new).get("plans") if args.plans_new else {}) or {}
    tmin_old, tmin_new = warm_min(old), warm_min(new)
    sh_old, sh_new = shuffle_bytes(old), shuffle_bytes(new)

    added = sorted(set(tmin_new) - set(tmin_old))
    removed = sorted(set(tmin_old) - set(tmin_new))
    common = sorted(set(tmin_old) & set(tmin_new))

    fp_changed, above_band, inside = [], [], 0
    for q in common:
        a, b = tmin_old[q], tmin_new[q]
        ratio = b / a if a > 0 else float("inf")
        fpa, fpb = plans_old.get(q), plans_new.get(q)
        row = {"q": q, "old": a, "new": b, "ratio": ratio, "fp_old": fpa, "fp_new": fpb}
        if fpa and fpb and fpa != fpb:
            fp_changed.append(row)
        elif ratio > args.band or ratio < 1.0 / args.band:
            above_band.append(row)
        else:
            inside += 1
    above_band.sort(key=lambda r: -max(r["ratio"], 1 / r["ratio"]))

    def sec(v):
        return f"{v:.3f}"

    lines = []
    w = lines.append
    w(f"# bench_diff: {args.old} -> {args.new}")
    w("")
    w(f"Discipline: per-query **warm-pass minimums**, noise band **{args.band}x** "
      f"(BENCH_NOISE_r07.json), plan-fingerprint equality gates attribution.")
    w("")

    def hot_flag(path):
        try:
            with open(path) as f:
                return json.load(f).get("hot_session")
        except Exception:
            return None

    hot_old, hot_new = hot_flag(args.old), hot_flag(args.new)
    w(f"- comparison base: `{args.old}` (hot_session: {hot_old}) -> "
      f"new: `{args.new}` (hot_session: {hot_new})")
    if hot_old:
        w("- **WARNING: the base record is a hot-session stamp — prefer "
          "the last non-hot record as the base.**")
    if hot_new:
        w("- **WARNING: the new record is a hot-session stamp (canary "
          "solos above band) — its totals are NOT comparable; the next "
          "round must diff against the last non-hot base.**")
    w("")
    tot_old, tot_new = sum(tmin_old.values()), sum(tmin_new.values())
    w(f"- queries: {len(tmin_old)} old / {len(tmin_new)} new "
      f"({len(common)} common, {len(added)} new, {len(removed)} removed)")
    w(f"- warm-min totals: {sec(tot_old)} s -> {sec(tot_new)} s")
    w(f"- inside noise band with unchanged fingerprint: {inside}/{len(common)}")
    w("")
    w("## Fingerprint changed (plan is different — wall time not comparable)")
    w("")
    if fp_changed:
        w("| query | old s | new s | ratio | fp old | fp new |")
        w("|---|---|---|---|---|---|")
        for r in fp_changed:
            w(f"| {r['q']} | {sec(r['old'])} | {sec(r['new'])} | {r['ratio']:.2f}x "
              f"| {r['fp_old']} | {r['fp_new']} |")
    else:
        w("(none)")
    w("")
    # solo fresh-JVM controls for the above-band rows (VERDICT r13 #5):
    # generated, not hand-run prose
    controls = {}
    if args.controls:
        for r in above_band:
            runs = solo_runs(r["q"], args.controls)
            solo = min(runs) if runs else None
            if solo is None:
                verdict = "control failed"
            elif r["old"] / args.band <= solo <= r["old"] * args.band:
                verdict = "solo at old baseline -> box noise"
            elif r["new"] / args.band <= solo <= r["new"] * args.band:
                verdict = "solo tracks the new number -> real move"
            else:
                verdict = "solo matches neither -> investigate"
            r["solo"], r["solo_verdict"] = solo, verdict
            controls[r["q"]] = {"old": r["old"], "new": r["new"],
                                "solo_runs": runs, "solo_min": solo,
                                "verdict": verdict}
    w(f"## Above noise band (> {args.band}x either way, fingerprint unchanged/unknown)")
    w("")
    if above_band:
        solo_col = " solo s | verdict |" if args.controls else ""
        w(f"| query | old s | new s | ratio | note |{solo_col}")
        w("|---|---|---|---|---|" + ("---|---|" if args.controls else ""))
        for r in above_band:
            note = "slower" if r["ratio"] > 1 else "faster"
            if r["fp_old"] is None or r["fp_new"] is None:
                note += ", no fingerprint"
            if sh_old.get(r["q"]) is not None and sh_new.get(r["q"]) is not None:
                note += f", shuffle {human(sh_old[r['q']])} -> {human(sh_new[r['q']])}"
            solo_cell = ""
            if args.controls:
                s = r.get("solo")
                solo_cell = (f" {sec(s)} | {r['solo_verdict']} |" if s is not None
                             else f" - | {r.get('solo_verdict', '-')} |")
            w(f"| {r['q']} | {sec(r['old'])} | {sec(r['new'])} | {r['ratio']:.2f}x | {note} |{solo_cell}")
    else:
        w("(none)")
    w("")
    if args.noise_out is not None:
        noise = {"band": args.band,
                 "sf_dir": args.controls or None,
                 "note": "solo fresh-JVM OneQuery controls for above-band "
                         "fingerprint-unchanged rows; generated by "
                         "bench_diff.py --controls (VERDICT r13 #5)",
                 "controls": controls}
        with open(args.noise_out, "w") as f:
            json.dump(noise, f, indent=1)
    # shuffle bytes are the direct "plan got wider" signal: flag material
    # moves (>1.2x and >1 MB) regardless of wall time — these deserve a
    # look even when the clock sat happily inside the noise band
    sh_moved = []
    for q in common:
        a, b = sh_old.get(q), sh_new.get(q)
        if a is None or b is None or max(a, b) < (1 << 20):
            continue
        r = b / a if a > 0 else float("inf")
        if r > 1.2 or r < 1 / 1.2:
            sh_moved.append((q, a, b, r))
    sh_moved.sort(key=lambda t: -max(t[3], 1 / t[3]))
    w("## Shuffle bytes moved (>1.2x and >1 MB — plan width changed)")
    w("")
    if sh_moved:
        w("| query | old | new | ratio |")
        w("|---|---|---|---|")
        for q, a, b, r in sh_moved:
            w(f"| {q} | {human(a)} | {human(b)} | {r:.2f}x |")
    elif sh_old and sh_new:
        w("(none — every common query's steady-state shuffle is stable)")
    else:
        w("(no shuffle data on one or both records — pre-r8)")
    w("")
    w("## New queries")
    w("")
    w("\n".join(f"- {q}: {sec(tmin_new[q])} s" for q in added) or "(none)")
    w("")
    w("## Removed queries")
    w("")
    w("\n".join(f"- {q} (was {sec(tmin_old[q])} s)" for q in removed) or "(none)")
    w("")
    if args.scaling:
        with open(args.scaling) as f:
            sc = json.load(f)
        rows = sorted(sc.get("queries", {}).items(),
                      key=lambda kv: -kv[1]["exponent"])
        supl = [q for q, v in rows if v["exponent"] > 1.1]
        w(f"## Scaling exponents ({args.scaling}: "
          f"sf {sc.get('sf_small')} -> {sc.get('sf_big')}, warm-min)")
        w("")
        if supl:
            w(f"**SUPER-LINEAR REGRESSION FLAG: {', '.join(supl)}** — "
              f"exponent > 1.1; a plan here grows faster than its input.")
            w("")
        w("| query | t_small | t_big | exponent |")
        w("|---|---|---|---|")
        for q, v in rows:
            mark = " **<- super-linear**" if v["exponent"] > 1.1 else ""
            w(f"| {q} | {sec(v['t_small'])} | {sec(v['t_big'])} "
              f"| {v['exponent']:.2f}{mark} |")
        w("")

    report = "\n".join(lines)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report)
        print(f"wrote {args.out}: {len(fp_changed)} fp-changed, "
              f"{len(above_band)} above-band, {len(added)} new, {len(removed)} removed")
    else:
        print(report)


if __name__ == "__main__":
    main()
