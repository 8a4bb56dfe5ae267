#!/usr/bin/env python3
"""Dev-only fixture generator (NOT part of the library): reconstruct raw
feed snapshots (RHINO CSV, census CSV, FluView epidata JSON) that the
cold-start pipeline (FluFeeds.buildFromFeeds) turns into EXACTLY the five
golden tables (byte-copies of the reference's processed_files/*.csv).

The reference repo ships only the pipeline OUTPUTS, not its raw inputs,
so the feed->golden parity test needs inputs inverted from the outputs:

- census.csv     <- county_region's (name, density) verbatim.
- rhino.csv      <- one ACH-level row per (epiweek, illness, care) whose
                    exploded counties' golden values agree (asserted);
                    Spokane (the one dual-ACH county) gets a
                    Greater-Health-Now row ordered so keep-first dedup
                    reproduces its golden value.
- fluview.json   <- known wili pinned from illness.state_ili_percent;
                    unknown weeks SOLVED so Spark's sequential
                    sum/count within each year-partition reproduces the
                    golden per-year average bit-exactly (pandas used
                    pairwise summation, so 2024 — fully determined —
                    needs a record-order permutation instead).

Writes src/test/resources/feeds_golden/; FeedGoldenSpec runs the real
pipeline over these snapshots and asserts value-exact equality with the
goldens. Deterministic (seeded); regenerate with:
    python3 tools/make_golden_feeds.py
"""
import csv, json, math, random, sys
from fractions import Fraction

G = "src/test/resources/golden"
OUT = "src/test/resources/feeds_golden"

ACH_TO_COUNTIES = {  # FluOps.achToCounties (reference dag :49-59)
    "Better Health Together": ["Spokane", "Stevens", "Pend Oreille", "Ferry"],
    "Cascade Pacific Action Alliance": ["Thurston", "Mason", "Grays Harbor", "Pacific", "Lewis"],
    "Elevate Health": ["Yakima", "Kittitas"],
    "Greater Health Now": ["Spokane"],
    "Healthier Here": ["King"],
    "North Sound": ["Whatcom", "Skagit", "Snohomish", "San Juan", "Island"],
    "Olympic Community of Health": ["Clallam", "Jefferson", "Kitsap"],
    "Southwest Washington": ["Clark", "Skamania", "Klickitat", "Cowlitz", "Wahkiakum"],
    "Thriving Together NCW": ["Chelan", "Douglas", "Grant", "Okanogan"],
}
COUNTY_TO_ACHS = {}
for ach, cs in ACH_TO_COUNTIES.items():
    for c in cs:
        COUNTY_TO_ACHS.setdefault(c, []).append(ach)


def read(name):
    with open(f"{G}/{name}.csv") as f:
        return list(csv.DictReader(f))


def seq_avg(vals, n):
    s = 0.0
    for v in vals:
        s += v
    return s / n


def solve_year(order_weeks, fixed, target, solve_week, lo, hi):
    """Choose the value at solve_week so the sequential double fold over
    order_weeks (others from `fixed`) divided by len(order_weeks) equals
    `target` exactly. Returns the full {week: value} map."""
    n = len(order_weeks)
    others = Fraction(0)
    for w in order_weeks:
        if w != solve_week:
            others += Fraction(fixed[w])
    guess = float(Fraction(target) * n - others)
    for _ in range(100000):
        vals = dict(fixed)
        vals[solve_week] = guess
        got = seq_avg([vals[w] for w in order_weeks], n)
        if got == target:
            assert lo < guess < hi, (solve_week, guess, lo, hi)
            return vals
        guess = math.nextafter(guess, math.inf if got < target else -math.inf)
    raise AssertionError(f"no solution for {solve_week}")


def main():
    cr, tmp, ill, hc, hist = (read(n) for n in
        ("county_region", "temporal", "illness", "healthcare", "historic_flu"))
    id2name = {r["county_id"]: r["county_name"] for r in cr}
    week_of = {r["epiweek_id"]: r for r in tmp}

    # ---------------------------------------------------------- census
    with open(f"{OUT}/census.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["County Name", "Population Density 2020"])
        for r in cr:
            w.writerow([r["county_name"], r["population_density_2020"]])

    # ----------------------------------------------------------- rhino
    # Group golden illness rows by (epiweek, illness, care); emit one
    # ACH-level raw row per agreeing exclusive-county group.
    bykey = {}
    for r in ill:
        key = (r["epiweek_id"], r["respiratory_illness_type"], r["care_type"])
        bykey.setdefault(key, {})[id2name[r["county_id"]]] = r["county_ili_percent"]

    rows = []  # (Location, epiweek, pct_string)
    ghn_covered = False
    for key in sorted(bykey):
        counties = bykey[key]
        claimed = set()
        emitted = []  # this key's rows, GHN-first if Spokane disagrees
        for ach, members in ACH_TO_COUNTIES.items():
            if ach == "Greater Health Now":
                continue
            exclusive = [c for c in members if len(COUNTY_TO_ACHS[c]) == 1]
            present = [c for c in exclusive if c in counties]
            if not present:
                continue
            vals = {counties[c] for c in present}
            assert len(vals) == 1, f"{key} {ach}: exclusive counties disagree {vals}"
            missing = [c for c in exclusive if c not in counties]
            assert not missing, f"{key} {ach}: fan-out incomplete, missing {missing}"
            emitted.append((ach, vals.pop()))
            claimed.update(members)
        spokane = counties.get("Spokane")
        if spokane is not None:
            bht = dict(emitted).get("Better Health Together")
            if bht is None or bht != spokane:
                # real keep-first winner was the GHN row: order it first
                emitted.insert(0, ("Greater Health Now", spokane))
                ghn_covered = True
            claimed.add("Spokane")
        unclaimed = set(counties) - claimed
        assert not unclaimed, f"{key}: rows for {unclaimed} not explained by any ACH"
        rows.extend((ach, key, v) for ach, v in emitted)

    if not ghn_covered:
        # county_region needs Spokane observed with GHN at least once; a
        # duplicate of an existing (key, value) changes nothing else
        # (keep-first drops it; the healthcare tuple already exists).
        for i, (ach, key, v) in enumerate(rows):
            if ach == "Better Health Together" and bykey[key].get("Spokane") == v:
                rows.insert(i + 1, ("Greater Health Now", key, v))
                break

    # -------------------------------------------------- healthcare repair
    # rhino.csv so far reproduces ILLNESS exactly, but healthcare's means
    # run over DISTINCT (county, illness, care, pct) tuples of the raw
    # feed — tuples the keep-first dedup dropped from illness still shaped
    # the golden means. Spokane is the one county whose tuple set (BHT ∪
    # GHN) the illness inversion under-covers: solve one extra GHN-only
    # row per care type (GHN explodes to Spokane alone, so nothing else
    # moves) making Spokane's mean land on the golden value. The epiweek
    # key reuses one Spokane already occupies, so keep-first drops the
    # row from illness and temporal/county_region are untouched.
    tuples = set()
    for ach, (ep, illtype, care), pct in rows:
        if pct.strip() == "":
            continue
        for c in ACH_TO_COUNTIES[ach]:
            tuples.add((c, illtype, care, float(pct)))
    hc_by_name = {id2name[r["county_id"]]: r for r in hc}
    for care, col in (("Hospitalizations", "hospitalization_percent"),
                      ("Emergency Visits", "er_visit_percent")):
        vals = [v for (c, i, ca, v) in tuples if c == "Spokane" and ca == care]
        target = Fraction(float(hc_by_name["Spokane"][col]))
        if sum(Fraction(v) for v in vals) / len(vals) == target:
            continue
        v = float(target * (len(vals) + 1) - sum(Fraction(x) for x in vals))
        assert 0.0 < v < 100.0, (care, v)
        key = next(k for k in sorted(bykey)
                   if k[2] == care and "Spokane" in bykey[k])
        assert ("Spokane", key[1], care, v) not in tuples, (key, v)
        tuples.add(("Spokane", key[1], care, v))
        rows.append(("Greater Health Now", key, repr(v)))
    # self-check: every county's healthcare means now match the golden
    # within 1e-12 relative (FeedGoldenSpec's sanctioned tolerance)
    for name, r in hc_by_name.items():
        for care, col in (("Hospitalizations", "hospitalization_percent"),
                          ("Emergency Visits", "er_visit_percent")):
            vs = [v for (c, i, ca, v) in tuples if c == name and ca == care]
            got = sum(vs) / len(vs) if vs else 0.0
            want = float(r[col])
            assert abs(got - want) <= 1e-12 * max(abs(got), abs(want)), (
                name, care, repr(got), repr(want))

    with open(f"{OUT}/rhino.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Location", "Week Start", "Week End", "Week", "Season",
                    "Respiratory Illness Category", "Care Type",
                    "Demographic Category", "1-Week Percent "])
        for ach, (ep, illtype, care), pct in rows:
            t = week_of[ep]
            w.writerow([ach, t["week_start"], t["week_end"], str(int(ep[4:6])),
                        t["season"], illtype, care, "Overall", pct])

    # --------------------------------------------------------- fluview
    known = {r["epiweek_id"]: float(r["state_ili_percent"])
             for r in ill if r["state_ili_percent"] != ""}
    hist_by_year = {r["year"]: r for r in hist}
    records = []  # (epiweek:int, wili:float) in the order Spark will sum
    for year in sorted(hist_by_year):
        h = hist_by_year[year]
        peak, avg = float(h["peak_ili_percent"]), float(h["average_wili_percent"])
        peak_week = h["peak_week_id"]
        n = 53 if year == "2020" else 52
        weeks = [f"{year}{i:02d}" for i in range(1, n + 1)]
        fixed = {w: known[w] for w in weeks if w in known}
        free = [w for w in weeks if w not in fixed]
        if not free:
            # 2024: fully determined by illness — permute the record
            # order until the sequential fold reproduces the pandas
            # (pairwise-summation) average bit-exactly.
            order = weeks[:]
            rng = random.Random(1)
            for _ in range(500000):
                if seq_avg([fixed[w] for w in order], n) == avg:
                    break
                rng.shuffle(order)
            else:
                raise AssertionError(f"{year}: no order matches avg")
            records.extend((int(w), fixed[w]) for w in order)
            continue
        if peak_week not in fixed:
            fixed[peak_week] = peak
            free.remove(peak_week)
        assert fixed[peak_week] == peak, (peak_week, fixed[peak_week], peak)
        # spread the unclaimed mass evenly over the free slots so the
        # solved slot lands near the filler, comfortably inside (0, peak)
        filler = round((avg * n - sum(fixed.values())) / len(free), 2)
        for w in free[:-1]:
            fixed[w] = filler
        vals = solve_year(weeks, fixed, avg, free[-1], 0.0, peak)
        assert max(vals.values()) == peak
        assert min(w for w, v in vals.items() if v == peak) == peak_week
        records.extend((int(w), vals[w]) for w in weeks)

    with open(f"{OUT}/fluview.json", "w") as f:
        f.write('{"result": 1, "message": "success", "epidata": [\n')
        f.write(",\n".join(
            f'  {{"region": "wa", "epiweek": {ep}, "wili": {w!r}}}'
            for ep, w in records))
        f.write("\n]}\n")

    # ------------------------------------------------- self-check notes
    for year in sorted(hist_by_year):
        ys = [w for e, w in records if str(e)[:4] == year]
        got = seq_avg(ys, len(ys))
        want = float(hist_by_year[year]["average_wili_percent"])
        assert got == want, (year, repr(got), repr(want))
    print(f"rhino rows: {len(rows)}, fluview records: {len(records)}; "
          "per-year sequential averages match golden bit-exactly")


if __name__ == "__main__":
    sys.exit(main())
