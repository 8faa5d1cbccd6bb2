"""Linkage-disequilibrium r² between nearby variant pairs (beyond-reference
extension surface; plink --r2 / bcftools +prune family).

LD is the canonical quadratic-looking genomics computation — naive form is
a site × site correlation matrix — made tractable by locality: LD decays
with distance, so real pipelines only score pairs within a window. The plan
here is the banded-join discipline the repo uses everywhere (range_join /
interval_overlap_join): never a theta join, never sample-level pair
explosion.

Plan shape:
  1. one groupBy(site) packs each site's calls into a sample→dosage MAP
     (dosage = alt-allele count 0/1/2, genotype-based composite LD — what
     plink computes without phase);
  2. sites self-join on position bins of width = the window (each left row
     probes bins b and b+1, so every ordered pair within the window matches
     exactly once — no distinct());
  3. per pair, one HOF fold over the two maps' common samples accumulates
     the six integer sums (n, Σx, Σy, Σxy, Σx², Σy²) — pairwise deletion
     of samples missing at either site, all-integer until the final r²
     division.

Shuffle cost: sites × panel-width maps through one equi-join; the
correlation never touches a per-sample pair row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ld_r2(
    df: DataFrame,
    site_col: str,
    pos_col: str,
    sample_col: str,
    dosage_col: str,
    max_dist: int,
    min_samples: int = 2,
    materialize_sites: bool = True,
) -> DataFrame:
    """Pairwise genotype r² for all site pairs with 0 < pos_b − pos_a ≤
    `max_dist` (ordered: each unordered pair appears once, a-side first).

    Input: long table of called dosages (rows with NULL dosage are
    ignored), UNIQUE per (site, sample) — a duplicated sample raises
    DUPLICATED_MAP_KEY under the session's default policy (an explicit
    error, never a partition-dependent pick; aggregate duplicates away
    upstream). A sample contributes to a pair only when called at BOTH
    sites (pairwise deletion). Output: site_a, site_b, pos_a, pos_b,
    n_samples BIGINT, r2 DOUBLE (round 4; NULL when fewer than
    `min_samples` common samples or either site is monomorphic across
    the common set — correlation is undefined there, and a silent 0
    would read as linkage equilibrium, which is a claim, not a gap).

    materialize_sites: the self-join's two sides are non-identical
    subtrees (the left adds the bin explode), so Catalyst's
    ReuseExchange never fires and the per-site map aggregation — the
    heaviest stage, one full pass over the call table — would run TWICE.
    True (default) localCheckpoints the per-site relation so both sides
    read the materialized rows (one eager job at call time, the
    connected-components precedent); pass False to stay fully lazy when
    the input is already a materialized site-map table."""
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    b = int(max_dist)
    site, pos = F.col(site_col), F.col(pos_col)
    per_site = (
        df.filter(F.col(dosage_col).isNotNull())
        .groupBy(site.alias("s"), pos.alias("p"))
        .agg(
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col(sample_col).alias("k"),
                            F.col(dosage_col).cast("long").alias("v"),
                        )
                    )
                )
            ).alias("g")
        )
    )
    if materialize_sites:
        per_site = per_site.localCheckpoint()
    left = per_site.select(
        F.col("s").alias("site_a"),
        F.col("p").alias("pos_a"),
        F.col("g").alias("__ga"),
        F.explode(
            F.array((F.col("p") / b).cast("long"), (F.col("p") / b).cast("long") + 1)
        ).alias("__bin"),
    )
    right = per_site.select(
        F.col("s").alias("site_b"),
        F.col("p").alias("pos_b"),
        F.col("g").alias("__gb"),
        (F.col("p") / b).cast("long").alias("__bin"),
    )
    pairs = left.join(right, "__bin").filter(
        (F.col("pos_b") > F.col("pos_a"))
        & (F.col("pos_b") - F.col("pos_a") <= b)
    )
    common = F.filter(
        F.map_keys(F.col("__ga")),
        lambda k: F.map_contains_key(F.col("__gb"), k),
    )
    zero = F.lit(0).cast("long")
    init = F.struct(
        zero.alias("n"), zero.alias("sx"), zero.alias("sy"),
        zero.alias("sxy"), zero.alias("sxx"), zero.alias("syy"),
    )

    def step(acc, k):
        x = F.element_at(F.col("__ga"), k)
        y = F.element_at(F.col("__gb"), k)
        return F.struct(
            (acc["n"] + 1).alias("n"),
            (acc["sx"] + x).alias("sx"),
            (acc["sy"] + y).alias("sy"),
            (acc["sxy"] + x * y).alias("sxy"),
            (acc["sxx"] + x * x).alias("sxx"),
            (acc["syy"] + y * y).alias("syy"),
        )

    st = F.aggregate(common, init, step)
    n, sx, sy = st["n"], st["sx"], st["sy"]
    cov_n = n * st["sxy"] - sx * sy        # n²·cov — integers, exact
    var_x = n * st["sxx"] - sx * sx        # n²·var — integers, exact
    var_y = n * st["syy"] - sy * sy
    r2 = F.when(
        (n >= min_samples) & (var_x > 0) & (var_y > 0),
        F.round(
            (cov_n * cov_n).cast("double")
            / (var_x * var_y).cast("double"),
            4,
        ),
    )
    return pairs.select(
        "site_a", "site_b", "pos_a", "pos_b",
        n.alias("n_samples"), r2.alias("r2"),
    ).filter(F.col("n_samples") >= 1)  # no common data -> no pair row


def king_kinship(
    df: DataFrame,
    site_col: str,
    sample_col: str,
    dosage_col: str,
    min_sites: int = 10,
) -> DataFrame:
    """Pairwise KING-robust kinship over a sample panel (Manichaikul et
    al. 2010; plink2 --make-king family): for samples i < j over their
    shared called sites,

        φ̂ = (N_het_both − 2·N_opposite_hom) / (N_het_i + N_het_j)

    — ≈0.25 parent-offspring/full sibs, ≈0 unrelated, negative for
    population-structure divergence. Output: (sample_a, sample_b,
    n_shared BIGINT, phi DOUBLE round 4; NULL when fewer than
    `min_sites` shared sites or neither sample is ever het across them —
    the estimator is undefined, and 0 would claim "unrelated").

    Kinship is inherently all-pairs in the PANEL (n² in samples, the
    algorithm's own complexity class — every published tool pays it);
    what must never happen is all-pairs in SITES or a shuffle of
    site×sample×sample rows. Plan: one groupBy(site) collects the site's
    called (sample, dosage) list — bounded by panel width, the
    minhash-bucket contract — a HOF expression expands each site's
    within-site pairs with integer per-site counter structs, and ONE
    partial-aggregated groupBy(pair) sums them. The corpus shuffles
    (site, panel-list) rows once and pairs×counters once; dosage maps
    per sample (sites-sized rows) never materialize."""
    if min_sites < 1:
        raise ValueError(f"min_sites must be >= 1, got {min_sites}")
    per_site = (
        df.filter(F.col(dosage_col).isNotNull())
        .groupBy(F.col(site_col).alias("s"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(sample_col).alias("k"),
                        F.col(dosage_col).cast("int").alias("d"),
                    )
                )
            ).alias("g")
        )
    )
    n = F.size("g")
    # Streaming i<j pair expansion in two chained generators — same
    # rewrite as graph.py's wedge expansion (round 15): the flattened
    # nested-transform form materialized all C(panel, 2) structs as one
    # array per site row before exploding.
    expanded = (
        per_site.filter(n >= 2)
        .select("g", F.posexplode("g").alias("__i", "__e"))
        .select(
            "__e",
            F.explode(
                F.slice(F.col("g"), F.col("__i") + 2, F.size("g"))
            ).alias("__y"),
        )
        .select(
            F.col("__e")["k"].alias("ka"),
            F.col("__y")["k"].alias("kb"),
            F.col("__e")["d"].alias("da"),
            F.col("__y")["d"].alias("db"),
        )
    )
    da, db = F.col("da"), F.col("db")
    agg = expanded.groupBy(
        F.col("ka").alias("sample_a"), F.col("kb").alias("sample_b")
    ).agg(
        F.count(F.lit(1)).alias("n_shared"),
        F.sum(((da == 1) & (db == 1)).cast("int")).alias("__hb"),
        F.sum((F.abs(da - db) == 2).cast("int")).alias("__opp"),
        F.sum((da == 1).cast("int")).alias("__ha"),
        F.sum((db == 1).cast("int")).alias("__hbj"),
    )
    denom = F.col("__ha") + F.col("__hbj")
    phi = F.when(
        (F.col("n_shared") >= min_sites) & (denom > 0),
        F.round(
            (F.col("__hb") - 2 * F.col("__opp")).cast("double")
            / denom.cast("double"),
            4,
        ),
    )
    return agg.select("sample_a", "sample_b", "n_shared", phi.alias("phi"))


def grm(
    df: DataFrame,
    site_col: str,
    sample_col: str,
    dosage_col: str,
    include_diagonal: bool = True,
) -> DataFrame:
    """Genetic relatedness matrix (GCTA --make-grm / VanRaden 2008): for
    samples j ≤ k over their shared called polymorphic sites,

        G_jk = (1 / N_jk) Σ_i  (x_ij − 2p̂_i)(x_ik − 2p̂_i)
                               / (2 p̂_i (1 − p̂_i))

    with x the alt-allele dosage (0/1/2), p̂_i the site's alt frequency
    estimated from ALL called genotypes at that site, and N_jk the
    pairwise-complete site count (GCTA's missing policy: a site missing
    in either sample contributes to neither numerator nor denominator).
    Monomorphic sites (p̂ ∈ {0,1}) carry zero variance and are excluded
    before pairing. Diagonal G_jj ≈ 1 + F (the inbreeding coefficient);
    off-diagonal ≈ 2φ (twice [[king_kinship]]'s φ, but frequency-weighted
    — rare-allele sharing counts for more, KING's robustness trade-off in
    the other direction). Output: (sample_a ≤ sample_b, n_shared BIGINT,
    grm DOUBLE round 6; NULL when no shared polymorphic calls).

    Plan: same shape as `king_kinship` — the relatedness matrix is
    inherently panel², never sites². One groupBy(site) computes p̂ AND
    packs the site's called (sample, dosage) list in the same partial
    aggregation; a HOF expression expands each site's within-site pairs
    (j ≤ k when `include_diagonal`) carrying the standardized product as
    a double; ONE partial-aggregated groupBy(pair) averages. The corpus
    shuffles (site, panel-list) rows once and pairs×(sum, count) once;
    no site×site term, no sample-dosage matrix on the driver."""
    per_site = (
        df.filter(F.col(dosage_col).isNotNull())
        .groupBy(F.col(site_col).alias("s"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(sample_col).alias("k"),
                        F.col(dosage_col).cast("double").alias("d"),
                    )
                )
            ).alias("g"),
            F.sum(F.col(dosage_col).cast("double")).alias("__sum_d"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    p = F.col("__sum_d") / (2.0 * F.col("__n"))
    per_site = per_site.withColumn("__p", p).filter(
        (F.col("__p") > 0.0) & (F.col("__p") < 1.0)
    )
    # standardized per-call z = (d - 2p) / sqrt(2p(1-p)), computed once
    # per (site, sample) before pair expansion so each product is a
    # single multiply inside the HOF. try_divide, NOT /: the p ∈ (0,1)
    # filter excludes the zero-variance rows, but Catalyst may evaluate
    # this transform on pre-filter rows (e.g. a size(g) > 0 predicate
    # inferred from the downstream generate lands in the same Filter),
    # and under ANSI mode a plain divide then raises DIVIDE_BY_ZERO on
    # monomorphic sites. try_divide is value-identical wherever the
    # divisor is nonzero — i.e. on every row that survives the filter.
    z = F.transform(
        F.col("g"),
        lambda e: F.struct(
            e["k"].alias("k"),
            F.try_divide(
                e["d"] - 2.0 * F.col("__p"),
                F.sqrt(2.0 * F.col("__p") * (1.0 - F.col("__p"))),
            ).alias("z"),
        ),
    )
    per_site = per_site.select(F.col("s"), z.alias("g"))
    n = F.size("g")
    self_off = 0 if include_diagonal else 1
    # Streaming j<=k (or j<k) pair expansion in two chained generators —
    # same rewrite as king_kinship's (round 15). posexplode is 0-based;
    # the suffix slice starts at the element itself (diagonal) or the
    # next one.
    expanded = (
        per_site.filter(n >= (1 if include_diagonal else 2))
        .select("g", F.posexplode("g").alias("__i", "__e"))
        .select(
            "__e",
            F.explode(
                F.slice(
                    F.col("g"),
                    F.col("__i") + 1 + self_off,
                    F.size("g"),
                )
            ).alias("__y"),
        )
        .select(
            F.col("__e")["k"].alias("ka"),
            F.col("__y")["k"].alias("kb"),
            (F.col("__e")["z"] * F.col("__y")["z"]).alias("zz"),
        )
    )
    agg = expanded.groupBy(
        F.col("ka").alias("sample_a"), F.col("kb").alias("sample_b")
    ).agg(
        F.count(F.lit(1)).alias("n_shared"),
        F.sum("zz").alias("__szz"),
    )
    return agg.select(
        "sample_a",
        "sample_b",
        "n_shared",
        F.round(F.col("__szz") / F.col("n_shared"), 6).alias("grm"),
    )


def pca_from_grm(grm_df: DataFrame, n_components: int = 2):
    """Principal components of population structure from a GRM (the
    smartpca / plink --pca composition): eigendecompose the S×S
    relatedness matrix and return per-sample coordinates
    PC_c = v_c · sqrt(λ_c) for the top `n_components` non-negative
    eigenvalues. Returns a list of (sample, [pc1, pc2, ...]) tuples
    sorted by sample key.

    The GRM collect is a MODEL-SIZED driver action by construction —
    S samples yield S(S+1)/2 rows (2,504 1000G samples ≈ 3.1M rows /
    ~50 MB), independent of site count; the sites-sized relation never
    leaves the cluster. Eigenvector sign is canonicalized (first
    nonzero loading positive) so results are deterministic across BLAS
    implementations. For biobank-scale panels (S > ~10^4, where the
    S×S collect stops being model-sized) use `grm_pca_power`: the
    distributed fixed-round power-iteration path over the pair table
    — same scaling and sign convention, tested to agree with this
    eigh on separated spectra."""
    import numpy as np

    rows = grm_df.select("sample_a", "sample_b", "grm").collect()
    samples = sorted({r["sample_a"] for r in rows} | {r["sample_b"] for r in rows})
    idx = {s: i for i, s in enumerate(samples)}
    m = np.zeros((len(samples), len(samples)))
    for r in rows:
        v = 0.0 if r["grm"] is None else float(r["grm"])
        i, j = idx[r["sample_a"]], idx[r["sample_b"]]
        m[i, j] = v
        m[j, i] = v
    vals, vecs = np.linalg.eigh(m)
    order = np.argsort(vals)[::-1][:n_components]
    coords = np.zeros((len(samples), len(order)))
    for c, ei in enumerate(order):
        lam = max(float(vals[ei]), 0.0)
        v = vecs[:, ei]
        nz = np.nonzero(np.abs(v) > 1e-12)[0]
        if len(nz) and v[nz[0]] < 0:
            v = -v
        coords[:, c] = v * np.sqrt(lam)
    return [(s, [float(x) for x in coords[idx[s]]]) for s in samples]


def _grm_matvec(edges: DataFrame, x: DataFrame) -> DataFrame:
    """One distributed GRM matvec: broadcast the S-row vector into an
    equi-join against the symmetric pair table, then one
    groupBy(sample) sum — the unit `grm_pca_power` iterates and the
    plan the shape guard in tests/test_plan_shapes.py pins (broadcast
    hash join; never a cartesian, never a driver-side matrix)."""
    xb = x.select(F.col("s").alias("b"), F.col("v").alias("xb"))
    return (
        edges.join(F.broadcast(xb), "b")
        .groupBy(F.col("a").alias("s"))
        .agg(F.sum(F.col("g") * F.col("xb")).alias("v"))
    )


def grm_pca_power(
    grm_df: DataFrame,
    n_components: int = 2,
    n_iterations: int = 30,
    a_col: str = "sample_a",
    b_col: str = "sample_b",
    grm_col: str = "grm",
) -> DataFrame:
    """DISTRIBUTED principal components from the GRM pair relation —
    the biobank-scale path `pca_from_grm` cannot take: that operator
    collects the S×S matrix and runs a driver eigh (fine at S = 2,504
    ≈ 3.1M pair rows; a driver OOM at S = 100k ≈ 5G rows). Here the
    pair table NEVER leaves the cluster: fixed-round power iteration
    (the `g_hits` / g_pagerank unrolled-round device) with Hotelling
    deflation extracts the top `n_components` eigenpairs,

        x ← (A − Σ_j λ_j v_j v_jᵀ) x / ‖·‖   (n_iterations rounds)
        λ  = xᵀ A' x                          (Rayleigh quotient)
        PC_c = v_c · sqrt(λ_c)                (pca_from_grm's scaling)

    entirely as DataFrame ops: each matvec is one broadcast join of
    the S-row vector against the pair table + one groupBy(sample) sum;
    deflation needs only the scalar v_jᵀx (a broadcast 1-row agg), so
    A − λvvᵀ is never materialized. Per-round state is localCheckpoint-
    ed (the connected-components loop discipline) and the only driver
    traffic is the per-component sign/λ canonicalization (1-row each).

    Determinism: the start vector is the mix32-scrambled sample-id
    hash (never orthogonal to a data eigenvector in practice, unlike
    the all-ones vector), rounds are FIXED (no convergence collect),
    and eigenvector sign is canonicalized exactly like `pca_from_grm`
    (loading of the first sample key positive), so the two paths agree
    on well-separated spectra — pinned by test on planted structure.

    Convergence contract: component c resolves at rate
    (λ_{c+1}/λ_c)^n_iterations — population-structure GRMs have
    well-separated top eigenvalues and 30 rounds suffice; a NEAR-
    DEGENERATE pair (λ2/λ1 → 1, e.g. two equal-size equal-Fst
    subpopulations) mixes its two PCs within their shared eigenplane
    regardless of rounds. Raise n_iterations (cost is linear) or fall
    back to `pca_from_grm` when the spectrum is known degenerate and
    S is driver-sized.

    NULL grm pairs (no shared polymorphic calls) contribute 0. Output:
    (sample, pc1..pcC DOUBLE round 6, eigenvalue_1..C in a companion
    sense — λ_c is embedded in the PC scaling, matching pca_from_grm).

    Scale: pair table S(S+1)/2 rows stays distributed; vector S rows
    (model-sized broadcast: 100k samples ≈ 2 MB); cost = n_components
    × n_iterations joins, each one shuffle on the sample key.
    """
    if n_components < 1:
        raise ValueError("n_components must be >= 1")
    g = F.coalesce(F.col(grm_col).cast("double"), F.lit(0.0))
    upper = grm_df.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b"), g.alias("g")
    )
    # symmetric expansion: the pair table stores a <= b; the matvec
    # needs both directions, the diagonal exactly once.
    edges = upper.unionAll(
        upper.filter(F.col("a") != F.col("b")).select(
            F.col("b").alias("a"), F.col("a").alias("b"), "g"
        )
    ).localCheckpoint(eager=True)
    samples = edges.select(F.col("a").alias("s")).distinct()

    def _matvec(x: DataFrame) -> DataFrame:
        return _grm_matvec(edges, x)

    def _normalized(y: DataFrame) -> DataFrame:
        nrm = y.agg(
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("__nrm")
        )
        return y.crossJoin(F.broadcast(nrm)).select(
            "s",
            F.when(
                F.col("__nrm") > 0, F.col("v") / F.col("__nrm")
            ).otherwise(F.lit(0.0)).alias("v"),
        )

    comps: list[tuple[float, DataFrame]] = []
    for c in range(n_components):
        # mix32-scrambled deterministic start, distinct per component
        seed = F.xxhash64(F.col("s").cast("string"), F.lit(c))
        x = _normalized(
            samples.select(
                "s",
                (
                    (F.pmod(seed, F.lit(2_000_003)).cast("double"))
                    / F.lit(1_000_001.5)
                    - F.lit(1.0)
                ).alias("v"),
            )
        ).localCheckpoint(eager=True)
        for _ in range(n_iterations):
            y = _matvec(x)
            for lam_j, vj in comps:
                dot = (
                    x.join(
                        vj.select(
                            F.col("s"), F.col("v").alias("__vj")
                        ),
                        "s",
                    ).agg(
                        F.sum(F.col("v") * F.col("__vj")).alias("__dj")
                    )
                )
                y = (
                    y.join(
                        vj.select(F.col("s"), F.col("v").alias("__vj")),
                        "s",
                        "left",
                    )
                    .crossJoin(F.broadcast(dot))
                    .select(
                        "s",
                        (
                            F.col("v")
                            - F.lit(lam_j)
                            * F.col("__dj")
                            * F.coalesce(F.col("__vj"), F.lit(0.0))
                        ).alias("v"),
                    )
                )
            x = _normalized(y).localCheckpoint(eager=True)
        # Rayleigh quotient on the DEFLATED operator (x ⊥ previous
        # components up to iteration error, so A and A' agree here)
        lam_row = (
            _matvec(x)
            .join(x.select("s", F.col("v").alias("__x")), "s")
            .agg(F.sum(F.col("v") * F.col("__x")).alias("lam"))
            .collect()[0]
        )
        lam = max(float(lam_row["lam"] or 0.0), 0.0)
        # sign canonicalization: first sample key's nonzero loading > 0
        lead = (
            x.filter(F.abs(F.col("v")) > 1e-12)
            .orderBy(F.col("s").asc())
            .limit(1)
            .collect()
        )
        if lead and lead[0]["v"] < 0:
            x = x.select("s", (-F.col("v")).alias("v")).localCheckpoint(
                eager=True
            )
        comps.append((lam, x))

    out = samples
    for c, (lam, v) in enumerate(comps, start=1):
        out = out.join(
            v.select(
                "s",
                F.round(F.col("v") * F.lit(lam**0.5), 6).alias(
                    f"pc{c}"
                ),
            ),
            "s",
            "left",
        )
    return out.select(
        F.col("s").alias("sample"),
        *[
            F.coalesce(F.col(f"pc{c}"), F.lit(0.0)).alias(f"pc{c}")
            for c in range(1, n_components + 1)
        ],
    )


def kinship_prune(
    pairs: DataFrame,
    cutoff: float,
    a_col: str = "sample_a",
    b_col: str = "sample_b",
    phi_col: str = "phi",
):
    """Greedy relatedness pruning (plink2 --king-cutoff): from a pairwise
    kinship table ([[king_kinship]] / `grm` output), iteratively remove
    the sample participating in the MOST pairs with φ ≥ `cutoff` until
    no such pair remains — the minimum-vertex-cover heuristic every
    association study runs so no two retained samples are close
    relatives. Returns the ordered removal list as
    [(sample, n_pairs_at_removal)], ties broken by sample id (a total
    order — the pruned set is a pure function of the kinship table).

    The collect is MODEL-SIZED by construction: only pairs ABOVE the
    cutoff come to the driver — the related subgraph, vanishingly small
    in a real cohort (and bounded by panel², never by sites). The
    greedy loop is pure Python over that edge list; the sites-sized
    genotype relation never leaves the cluster — this is the same
    division of labor as `pca_from_grm`."""
    rows = (
        pairs.filter(F.col(phi_col) >= F.lit(float(cutoff)))
        .filter(F.col(a_col) != F.col(b_col))  # GRM diagonals, if fed
        .select(a_col, b_col)
        .collect()
    )
    edges = {(r[0], r[1]) for r in rows}
    removed = []
    while edges:
        counts: dict = {}
        for a, b in edges:
            counts[a] = counts.get(a, 0) + 1
            counts[b] = counts.get(b, 0) + 1
        victim = max(counts, key=lambda s: (counts[s], _neg_key(s)))
        removed.append((victim, counts[victim]))
        edges = {(a, b) for a, b in edges if a != victim and b != victim}
    return removed


def _neg_key(s):
    """Tie-break helper: prefer the SMALLEST id among equal counts, via
    max() — numeric ids negate; other types fall back to a stable
    string inversion."""
    if isinstance(s, (int, float)):
        return -s
    return tuple(-ord(c) for c in str(s))


def hudson_fst(
    df: DataFrame,
    site_cols: list[str],
    pop_col: str,
    pop_a: str,
    pop_b: str,
    a1_col: str = "a1",
    a2_col: str = "a2",
    ref_col: str = "REF",
    missing: str = ".",
) -> DataFrame:
    """Per-site Hudson Fst between two populations over the long
    parsed-genotype table (a1/a2 allele strings, `allele_expr` output +
    a population label column) — the standard population-differentiation
    scan (Bhatia, Patterson, Sankararaman & Price 2013, "Estimating and
    interpreting FST", eq. 10; what scikit-allel's
    `hudson_fst` and EIGENSOFT's smartpca compute):

        num = (p1−p2)² − p1(1−p1)/(n1−1) − p2(1−p2)/(n2−1)
        den = p1(1−p2) + p2(1−p1)
        fst = num / den

    with p = collapsed non-ref allele frequency and n = called allele
    count in each population (haploid rows contribute one allele,
    half-missing genotypes contribute their called allele — allele-based
    counting, multiallelics fold to ref/non-ref like `hwe_stats`). Rows
    whose population label is neither pop_a nor pop_b are ignored, so a
    many-population panel can be scanned pairwise without pre-filtering.

    Output: site_cols + n1/n2 BIGINT (allele counts), af_a/af_b DOUBLE
    (round 4), fst_num/fst_den/fst DOUBLE (round 6; NULL unless both
    populations have ≥2 called alleles and den > 0 — fixed-everywhere
    sites have den = 0 and are uninformative). Keep num and den in the
    output because genome-wide / windowed Fst is the RATIO OF SUMS of
    exactly these columns (Bhatia et al.'s "ratio of averages" — never
    average per-site fst), so any window rollup is one further groupBy.

    Plan: one conditional-sum groupBy on the site key — sites × 4
    counters of shuffle, Fst arithmetic a pure projection after the
    partial agg. At biobank scale the shuffle is sites-sized, never
    samples × sites."""
    a1, a2, ref = F.col(a1_col), F.col(a2_col), F.col(ref_col)
    ok1 = a1.isNotNull() & (a1 != missing)
    ok2 = a2.isNotNull() & (a2 != missing)
    n_ct = ok1.cast("int") + ok2.cast("int")
    alt_ct = (ok1 & (a1 != ref)).cast("int") + (ok2 & (a2 != ref)).cast("int")
    in_a = F.col(pop_col) == pop_a
    in_b = F.col(pop_col) == pop_b

    tot = lambda cond, c: F.sum(F.when(cond, c).otherwise(0))
    agg = df.groupBy(*site_cols).agg(
        tot(in_a, n_ct).cast("bigint").alias("n1"),
        tot(in_a, alt_ct).cast("bigint").alias("x1"),
        tot(in_b, n_ct).cast("bigint").alias("n2"),
        tot(in_b, alt_ct).cast("bigint").alias("x2"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    p1 = F.when(F.col("n1") > 0, F.col("x1") / n1)
    p2 = F.when(F.col("n2") > 0, F.col("x2") / n2)
    est_ok = (F.col("n1") >= 2) & (F.col("n2") >= 2)
    num = F.when(
        est_ok,
        (p1 - p2) * (p1 - p2)
        - p1 * (1.0 - p1) / (n1 - 1.0)
        - p2 * (1.0 - p2) / (n2 - 1.0),
    )
    den = F.when(est_ok, p1 * (1.0 - p2) + p2 * (1.0 - p1))
    return agg.select(
        *site_cols,
        "n1",
        "n2",
        F.round(p1, 4).alias("af_a"),
        F.round(p2, 4).alias("af_b"),
        # + 0.0 canonicalizes IEEE -0.0 (a tiny negative num rounds to
        # -0.0) so engines that print the sign bit agree
        (F.round(num, 6) + 0.0).alias("fst_num"),
        F.round(den, 6).alias("fst_den"),
        (F.round(F.when(den > 0, num / den), 6) + 0.0).alias("fst"),
    )


def prs_score(
    df: DataFrame,
    site_col: str,
    sample_col: str,
    dosage_col: str,
    weights: DataFrame,
    weight_site_col: str = "site",
    weight_col: str = "weight",
    mean_impute: bool = True,
) -> DataFrame:
    """Polygenic risk score (plink --score semantics): per sample, the
    weighted average of effect-allele dosages over a score file's
    sites,

        score = sum_sites w * dosage / (2 * S)

    with plink's default MEAN IMPUTATION for missing calls: a missing
    (site, sample) contributes w * 2p-hat (the site's alt frequency
    estimated from called dosages). The imputed form NEVER builds the
    site x sample grid — rewrite

        sum_called w*d + sum_missing w*2p
          = [sum_scored w*2p] + sum_called w*(d - 2p)

    so the first term is ONE broadcast constant and the per-sample
    work is a single agg over CALLED rows only. `mean_impute=False`
    gives plink's no-mean-imputation mode instead (average over the
    sample's called scored sites: sum w*d / (2 * n_called)).

    Sites absent from the score table drop; monomorphic sites
    contribute no between-sample signal by construction (every called
    d equals 2p-hat, so their adjustment is 0 and their imputed mass
    is a constant shift — plink's behavior). Output:
    (sample, n_called BIGINT, score DOUBLE round 9), one row per
    sample appearing at any scored site.

    Plan: broadcast join of the model-sized score table, one
    site-keyed agg for p-hat (broadcast back — sites in a score file
    are model-sized by definition), one sample-keyed agg. The corpus
    shuffles once, on the sample key."""
    st = F.col(site_col)
    sa = F.col(sample_col)
    dc = F.col(dosage_col).cast("double")
    w = weights.select(
        F.col(weight_site_col).alias("__site"),
        F.col(weight_col).cast("double").alias("__w"),
    )
    base = df.select(
        st.alias("__site"), sa.alias("__sample"), dc.alias("__d")
    ).join(F.broadcast(w), "__site")
    af = base.filter(F.col("__d").isNotNull()).groupBy("__site").agg(
        (F.sum("__d") / (2 * F.count("__d"))).alias("__p"),
        F.max("__w").alias("__w"),
    )
    scored = af.agg(
        F.count(F.lit(1)).cast("long").alias("__S"),
        F.sum(F.col("__w") * 2 * F.col("__p")).alias("__const"),
    )
    called = base.filter(F.col("__d").isNotNull()).join(
        F.broadcast(af.select("__site", "__p")), "__site"
    )
    if mean_impute:
        per = called.groupBy(F.col("__sample").alias("sample")).agg(
            F.count(F.lit(1)).cast("long").alias("n_called"),
            F.sum(
                F.col("__w") * (F.col("__d") - 2 * F.col("__p"))
            ).alias("__adj"),
        )
        out = per.crossJoin(F.broadcast(scored)).select(
            "sample",
            "n_called",
            F.round(
                (F.col("__const") + F.col("__adj"))
                / (2.0 * F.col("__S")),
                9,
            ).alias("score"),
        )
    else:
        out = called.groupBy(F.col("__sample").alias("sample")).agg(
            F.count(F.lit(1)).cast("long").alias("n_called"),
            F.round(
                F.sum(F.col("__w") * F.col("__d"))
                / (2.0 * F.count(F.lit(1))),
                9,
            ).alias("score"),
        )
    return out
