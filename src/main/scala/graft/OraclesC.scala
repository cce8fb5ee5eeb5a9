package graft

/** DuckDB oracle SQL for tier C (SURVEY §2) — the SQL spelling of
  * operators/Dedup|Similarity|TextAnalysis. Kept adjacent to the
  * Scala operators; any change there must be mirrored here (parity
  * rules in SURVEY §6).
  */
object OraclesC {

  /** doc_id → in-order word-3-gram shingle strings, over an arbitrary
    * corpus CTE (vintage-rewrite discipline: pass the vintage's CTE
    * name instead of post-hoc string surgery on the rendered SQL). */
  private def shinglesOver(corpus: String): String = s"""
    select doc_id, unnest([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)]) as s
    from (select doc_id, string_split(text, ' ') as w from $corpus)
  """
  private val SHINGLES = shinglesOver("documents")

  /** Distinct (doc_id, shingle) then 32-bit key — distinct BEFORE
    * hashing, matching array_distinct-then-h8 on the Spark side. */
  private def sh8Over(corpus: String): String = s"""
    select doc_id, substr(md5(s),1,8) as sh8
    from (select distinct doc_id, s from (${shinglesOver(corpus)}))
  """
  private val SH8 = sh8Over("documents")

  // MinHash geometry from the operator's own constants (Dedup)
  private val MHK = graft.operators.Dedup.MinhashK
  private val BANDS = graft.operators.Dedup.Bands
  private val R = MHK / BANDS // rows per band
  // the degenerate-bucket cap is part of the OPERATOR SEMANTICS, so
  // the oracle enforces the same cap (QUALIFY) — parity holds on any
  // corpus, including ones where the cap binds
  private val CAP = graft.operators.Dedup.BucketCap
  private val BAND_KEY =
    (1 to R).map(r => s"sig[$R*j+$r]").mkString("j::varchar || ':' || ", " || ':' || ", "")

  /** c33's shingle-diagonal span chain up to maximal cross-doc spans
    * (CTE list, no WITH keyword) — shared by c33 and c34. Geometry
    * interpolated from the operator constants. */
  private val C33_CHAIN = c33Chain()
  /** c33's span-evidence chain over an arbitrary corpus CTE — the
    * default is the whole table; c124 runs it over the funnel's
    * KEPT corpus (span dedup executes on what survives curation). */
  private def c33Chain(corpus: String = "documents"): String = s"""
      d33 as (select doc_id, string_split(text, ' ') as w0 from $corpus),
      sh33 as (
        select doc_id, p as pos,
               substr(md5(array_to_string(w0[p+1:p+${graft.operators.Dedup.SpanShingleW}], ' ')), 1, 16) as key
        from d33, lateral (select unnest(range(0, len(w0) - ${graft.operators.Dedup.SpanShingleW - 1})) as p) t),
      keyed33 as (
        select key from sh33 group by key
        having count(*) between 2 and ${graft.operators.Dedup.SpanOccCap}),
      pr33 as (
        select a.doc_id as doc_a, a.pos as pos_a, b.doc_id as doc_b, b.pos as pos_b
        from sh33 a join keyed33 using (key) join sh33 b using (key)
        where a.doc_id < b.doc_id),
      runs33 as (
        select doc_a, doc_b, pos_a - pos_b as diag, pos_a, pos_b,
               pos_a - row_number() over (
                 partition by doc_a, doc_b, pos_a - pos_b order by pos_a) as grp
        from pr33),
      spans as (
        select doc_a, doc_b, min(pos_a) as a_start, min(pos_b) as b_start,
               count(*) + ${graft.operators.Dedup.SpanShingleW - 1} as n_tokens
        from runs33 group by doc_a, doc_b, diag, grp
        having count(*) + ${graft.operators.Dedup.SpanShingleW - 1} >= ${graft.operators.Dedup.SpanMinTokens})"""

  /** The full BPE learn-and-apply chain (CTE list, no WITH): the tf
    * table, c40's ranked merge list, and the symbol tables s0..sN
    * after each greedy application step — shared by c57 (final-depth
    * counts) and c63 (per-budget counts off the SAME intermediate
    * tables). */
  private val BPE_CHAIN = s"""tf as materialized (
        select doc_id, term, count(*)::bigint as tf
        from (select doc_id, unnest(string_split(text, ' ')) as term from documents)
        group by 1, 2),
      words as (select term, sum(tf)::bigint as n from tf group by term),
      cand57 as (
        select term, n, substr(term, i::int, 2) as pair
        from words, unnest(range(1, length(term))) as t(i)
        where length(term) >= 2),
      bpe_merges as (
        select substr(pair, 1, 1) as a, substr(pair, 2, 1) as b,
               row_number() over (order by total desc, pair) as rank
        from (select pair, sum(n)::bigint as total from cand57 group by pair)
        qualify rank <= ${graft.operators.TextAnalysis.BpeMerges}),
      s0 as materialized (
        select term, i - 1 as pos, substr(term, i::int, 1) as sym
        from (select distinct term from tf) v,
             lateral (select unnest(range(1, length(term) + 1)) as i) t),
      ${(1 to graft.operators.TextAnalysis.BpeMerges)
        .map(k => bpeStep(k, s"s${k - 1}", s"s$k")).mkString(",")}"""

  /** One BPE merge-application step (CTE list, no leading comma):
    * greedy non-overlapping left-to-right collapse of merge `k` over
    * the symbol table `sIn(term, pos, sym)` → `sOut` (positions
    * re-densified). Match runs are consecutive only when a = b; the
    * even offsets of each run are exactly the greedy picks (the
    * operator kernel's left-to-right scan). The merge frame joins
    * `on true` (NOT a cross join): past the learned list's end the
    * step must be a no-op, and an empty cross join would erase the
    * symbol table. */
  private def bpeStep(k: Int, sIn: String, sOut: String,
      mDef: String = ""): String = s"""
      m$k as (${if (mDef.isEmpty) s"select a, b from bpe_merges where rank = $k"
        else mDef}),
      x$k as (
        select s.term, s.pos,
               case when m.a is not null and s.sym = m.a and nx.sym = m.b
                 then 1 else 0 end as hit
        from $sIn s
        left join m$k m on true
        left join $sIn nx on nx.term = s.term and nx.pos = s.pos + 1),
      i$k as (select term, pos,
                     pos - row_number() over (partition by term order by pos) as grp
              from x$k where hit = 1),
      t$k as materialized (select term, pos from (
                select term, pos, min(pos) over (partition by term, grp) as g0
                from i$k)
              where (pos - g0) % 2 = 0),
      $sOut as materialized (
        select term, row_number() over (partition by term order by pos) - 1 as pos, sym
        from (
          select s.term, s.pos,
                 case when tk.pos is not null then s.sym || nx.sym else s.sym end as sym
          from $sIn s
          left join t$k tk on tk.term = s.term and tk.pos = s.pos
          left join t$k tp on tp.term = s.term and tp.pos = s.pos - 1
          left join $sIn nx on nx.term = s.term and nx.pos = s.pos + 1
          where tp.pos is null))"""

  /** c3's MinHash-LSH chain up to verified candidate pairs (CTE list,
    * no WITH keyword) — shared by c3 and c12. */
  /** The shingle-set + 16-minhash-signature CTEs (shd, mh, sig) —
    * shared by c3's fixed-geometry chain and c114's geometry grid. */
  private val C3_SIG_CHAIN = s"""
      shd as (select distinct doc_id, s from ($SHINGLES)),
      mh as (
        select doc_id, i,
               min(case when i < ${MHK / 2} then substr(md5('0' || '|' || s), i*4 + 1, 4)
                        else substr(md5('1' || '|' || s), (i-${MHK / 2})*4 + 1, 4) end) as v
        from shd, unnest(range(0,$MHK)) as t(i)
        group by doc_id, i),
      sig as (
        select doc_id, list(v order by i) as sig from mh group by doc_id)"""

  private val C3_CHAIN = s"""$C3_SIG_CHAIN,
      bands as (
        select doc_id, md5($BAND_KEY) as band_key
        from sig, unnest(range(0,$BANDS)) as t(j)
        qualify count(*) over (partition by band_key) <= $CAP),
      cand as (
        select distinct a.doc_id as doc_a, b.doc_id as doc_b
        from bands a join bands b on a.band_key = b.band_key and a.doc_id < b.doc_id),
      sets as (select doc_id, list(s) as sh from shd group by doc_id),
      vpairs as (
        select doc_a, doc_b,
               round((len(sa.sh) + len(sb.sh) - u.uni)::double / u.uni, 4) as jaccard
        from cand
        join sets sa on cand.doc_a = sa.doc_id
        join sets sb on cand.doc_b = sb.doc_id,
        lateral (select len(list_distinct(list_concat(sa.sh, sb.sh))) as uni) u)"""

  private def dot(a: String, b: String) =
    s"list_sum(list_transform(range(1,65), i -> $a[i]::double * $b[i]::double))"
  private def cosine(a: String, b: String) =
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"

  /** NULL-on-degenerate rounded cosine — the oracle twin of the
    * operator tier's pairCos (r10 unification): zero norms make the
    * raw cosine 0/0 = NaN in DuckDB (double division never errors)
    * and NaN elements propagate; both are "no evidence" and must
    * rank LAST and compare FALSE, exactly as Spark's NULL does.
    * Orderings over it spell `desc nulls last` explicitly. */
  private def cosN(a: String, b: String) =
    s"(case when isnan(round(${cosine(a, b)}, 4)) then null else ${Rz(cosine(a, b), 4)} end)"
  private val markers = "['the','a','of','to','and','is','in','it']"
  private val SEMTH = graft.operators.Similarity.SemDedupThreshold

  /** c5's sign-LSH bucket CTE (first 8 dims, capped buckets) —
    * shared by c5 and c32, exactly the operator's default geometry. */
  private val SIGN_BUCKETS = s"""v as (
        select vec_id, embedding,
          (case when embedding[1] >= 0 then 1 else 0 end)
        + (case when embedding[2] >= 0 then 2 else 0 end)
        + (case when embedding[3] >= 0 then 4 else 0 end)
        + (case when embedding[4] >= 0 then 8 else 0 end)
        + (case when embedding[5] >= 0 then 16 else 0 end)
        + (case when embedding[6] >= 0 then 32 else 0 end)
        + (case when embedding[7] >= 0 then 64 else 0 end)
        + (case when embedding[8] >= 0 then 128 else 0 end) as bucket
        from embeddings
        qualify count(*) over (partition by bucket) <= $CAP)"""

  // operator parameters come from the SAME Scala constants the
  // operators default to — oracle and operator cannot drift
  private val NQ = graft.operators.Similarity.DefaultQueryCount
  private val NC = graft.operators.Similarity.DefaultCentroidCount
  private val NPROBE = graft.operators.Similarity.DefaultNProbe
  private val CSZ = graft.operators.Sampling.ChunkTokens
  private val CST = CSZ - graft.operators.Sampling.ChunkOverlap // stride
  private val TRAIN = graft.operators.Sampling.SplitTrainPct

  /** The df-capped jaccard evidence chain up to verified pairs at a
    * given bar (CTE list, no WITH keyword; final CTE = j2(doc_a,
    * doc_b, jac)) — ONE spelling for the c45/c51/c53 oracles,
    * mirroring the single memoized `jacAtLeast` frame their Spark
    * sides share. */
  private def J2_CHAIN(bar: Double) = s"""sh as ($SH8),
      keep as (select sh8 from sh group by sh8 having count(*) <= ${graft.operators.Dedup.DfCap}),
      shk as (select sh.* from sh join keep using (sh8)),
      sizes as (select doc_id, count(*) as n_sh from shk group by doc_id),
      inter as (select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as n_inter
                from shk a join shk b on a.sh8 = b.sh8 and a.doc_id < b.doc_id
                group by 1, 2),
      j2 as (select * from (
               select doc_a, doc_b,
                      round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) as jac
               from inter join sizes sa on inter.doc_a = sa.doc_id
                          join sizes sb on inter.doc_b = sb.doc_id)
             where jac >= $bar)"""

  /** c47's full PQ chain up to the ranked ADC scores (CTE list,
    * no WITH keyword) — shared by c47 and c55. */
  /** c47's PQ cell machinery up to per-vector codes + the query
    * lookup table (CTE list, no WITH) — shared by c47/c55 (via
    * C47_CHAIN) and c60's IVF-pruned serving. */
  private val C47_CELLS = s"""cb as (
        select e.vec_id as k, t.m,
               [e.embedding[t.m*${graft.operators.Similarity.PqSubDim}+i]::double
                for i in range(1,${graft.operators.Similarity.PqSubDim + 1})] as csub
        from embeddings e, unnest(range(0,${graft.operators.Similarity.PqSubspaces})) t(m)
        where e.vec_id < ${graft.operators.Similarity.PqCodebookK}),
      vm as (
        select e.vec_id, t.m,
               [e.embedding[t.m*${graft.operators.Similarity.PqSubDim}+i]::double
                for i in range(1,${graft.operators.Similarity.PqSubDim + 1})] as sub
        from embeddings e, unnest(range(0,${graft.operators.Similarity.PqSubspaces})) t(m)),
      vd as (
        select vm.vec_id, vm.m, cb.k,
               round(list_sum([(sub[i]-csub[i])*(sub[i]-csub[i])
                 for i in range(1,${graft.operators.Similarity.PqSubDim + 1})]), 4) as d2
        from vm join cb using (m)),
      codes as (
        select vec_id, m, k as code from vd
        qualify row_number() over (partition by vec_id, m order by d2, k) = 1),
      lut as (select vec_id as q_id, m, k, d2 from vd where vec_id < $NQ)"""

  private val C47_CHAIN = s"""$C47_CELLS,
      sc as (
        select l.q_id, c.vec_id, round(sum(l.d2), 4) as adist
        from codes c join lut l on l.m = c.m and l.k = c.code
        where c.vec_id <> l.q_id
        group by 1, 2),
      r47 as (select q_id, vec_id, adist,
              row_number() over (partition by q_id order by adist, vec_id)::bigint as rank
            from sc)"""

  private val VAL = graft.operators.Sampling.SplitValPct
  private val BUDGET = graft.operators.Sampling.DefaultTokenBudget
  private val SHARDS = graft.operators.Sampling.PackShards
  // c26's fixed-point trainer parameters, from the operator constants
  private val QS = graft.operators.Similarity.QuantScale
  private val QITERS = graft.operators.Similarity.QuantIters

  // PQ geometry, from the operator constants
  private val PSUB = graft.operators.Similarity.PqSubDim
  private val PM = graft.operators.Similarity.PqSubspaces
  private val PQK = graft.operators.Similarity.PqCodebookK
  private val PTOPK = graft.operators.Similarity.PqTopK

  /** (vec_id, m, sub) subspace slices — C47_CELLS' vm, standalone (CTE
    * body) so the trained/residual chains can slice arbitrary vector
    * CTEs the same way. */
  private val PQ_VM = s"""
        select e.vec_id, t.m,
               [e.embedding[t.m*$PSUB+i]::double
                for i in range(1,${PSUB + 1})] as sub
        from embeddings e, unnest(range(0,$PM)) t(m)"""

  /** One per-subspace fixed-point k-means iteration (the PQ
    * subquantizer trainer's loop body, trainPqCodebooks) — the
    * CTE-for-CTE replay: round-then-argmin assignment on the 4dp cell
    * (ties to min k), exact int64 fixed-point update, empty codewords
    * keep their previous centroid. `vmCte` is the (vec_id, m, sub)
    * slice CTE, `prev` the incoming codebook CTE (m, k, csub). */
  private def pqTrainIter(pfx: String, vmCte: String, prev: String, i: Int): String = s"""
      ${pfx}d$i as (
        select v.vec_id, v.m, cb.k, v.sub,
               round(list_sum([(sub[j]-csub[j])*(sub[j]-csub[j])
                 for j in range(1,${PSUB + 1})]), 4) as d2
        from $vmCte v join $prev cb using (m)),
      ${pfx}a$i as (
        select m, k as code, sub from ${pfx}d$i
        qualify row_number() over (partition by vec_id, m order by d2, k) = 1),
      ${pfx}u$i as (
        select m, code, j as dim,
               sum(floor(sub[j] * $QS + 0.5)::bigint) as s, count(*) as n
        from ${pfx}a$i, unnest(range(1,${PSUB + 1})) as t(j)
        group by m, code, j),
      ${pfx}m$i as (
        select m, code as k, list(s::double / (n * $QS)::double order by dim) as csub
        from ${pfx}u$i group by m, code),
      ${pfx}cb$i as (
        select c.m, c.k, coalesce(u.csub, c.csub) as csub
        from $prev c left join ${pfx}m$i u on u.m = c.m and u.k = c.k)"""

  /** The full per-subspace trainer chain: seed = first-PQK rows'
    * slices of `vmCte`, then QITERS unrolled iterations; the final
    * codebook CTE is `{pfx}cb{QITERS}`. */
  private def pqTrainChain(pfx: String, vmCte: String): String = s"""
      ${pfx}cb0 as (
        select m, vec_id as k, sub as csub from $vmCte where vec_id < $PQK),""" +
    (1 to QITERS).map(i => pqTrainIter(pfx, vmCte, s"${pfx}cb${i - 1}", i)).mkString(",")

  /** The PQ serving chain (encode → LUT → ADC → rank) over an
    * arbitrary codebook CTE `cb(m, k, csub)` — C47_CHAIN generalized;
    * the ranked CTE is `r{sfx}`. */
  private def pqServeCtes(cbCte: String, sfx: String, vmCte: String): String = s"""
      vd$sfx as (
        select v.vec_id, v.m, cb.k,
               round(list_sum([(sub[j]-csub[j])*(sub[j]-csub[j])
                 for j in range(1,${PSUB + 1})]), 4) as d2
        from $vmCte v join $cbCte cb using (m)),
      codes$sfx as (
        select vec_id, m, k as code from vd$sfx
        qualify row_number() over (partition by vec_id, m order by d2, k) = 1),
      lut$sfx as (select vec_id as q_id, m, k, d2 from vd$sfx where vec_id < $NQ),
      sc$sfx as (
        select l.q_id, c.vec_id, round(sum(l.d2), 4) as adist
        from codes$sfx c join lut$sfx l on l.m = c.m and l.k = c.code
        where c.vec_id <> l.q_id
        group by 1, 2),
      r$sfx as (select q_id, vec_id, adist,
              row_number() over (partition by q_id order by adist, vec_id)::bigint as rank
            from sc$sfx)"""

  /** The complete residual-IVFADC chain over an arbitrary coarse-
    * centroid CTE `centCte(c_id, c_emb)` (CTE list, no WITH): ranked
    * assignment (c60's exact spelling), probes at NPROBE, per-vector
    * residuals, the per-subspace trainer replayed over residual
    * slices ([[pqTrainChain]]), residual encode, per-(query, probed
    * cluster) LUTs from the query's own residual, ADC, rank. Final
    * ranked CTE = `{pfx}r`. Shared by c65 (seed centroids), c70 (the
    * variants report), and c71 (trained centroids). */
  private def residualServeChain(pfx: String, centCte: String,
      trainFilter: Option[String] = None, corpus: String = "embeddings",
      trainCorpus: Option[String] = None,
      queryPred: String = s"vec_id < $NQ",
      candPred: Option[String] = None,
      nprobe: Int = NPROBE,
      probeOverride: Option[String] = None): String = {
    // the subquantizer's training slices: by default the served
    // corpus's own residual rows (optionally filtered — c81's
    // base-only training); with trainCorpus, a SEPARATE residual
    // derivation over that corpus (c82: the index was trained on the
    // pre-churn corpus, which is not a subset of what is served)
    val trainVm = trainCorpus.map(_ => s"${pfx}uvm")
      .orElse(trainFilter.map(_ => s"${pfx}tvm")).getOrElse(s"${pfx}vm")
    val trainCtes = trainCorpus.map(tc => s"""
      ${pfx}ura as (
        select e.vec_id, c.c_id,
               row_number() over (partition by e.vec_id
                 order by ${cosN("e.embedding", "c.c_emb")} desc nulls last, c.c_id) as rn
        from $tc e cross join $centCte c),
      ${pfx}ures as (
        select e.vec_id,
               [e.embedding[i]::double - c.c_emb[i]::double
                for i in range(1,65)] as rv
        from $tc e
        join (select vec_id, c_id as cluster from ${pfx}ura where rn = 1) a
          on a.vec_id = e.vec_id
        join $centCte c on c.c_id = a.cluster),
      ${pfx}uvm as materialized (
        select vec_id, t.m,
               [rv[t.m*$PSUB+i] for i in range(1,${PSUB + 1})] as sub
        from ${pfx}ures, unnest(range(0,$PM)) t(m)),""").getOrElse(
      trainFilter.map(f => s"""
      ${pfx}tvm as (select * from ${pfx}vm where $f),""").getOrElse(""))
    s"""
      ${pfx}ra as (
        select e.vec_id, c.c_id,
               row_number() over (partition by e.vec_id
                 order by ${cosN("e.embedding", "c.c_emb")} desc nulls last, c.c_id) as rn
        from $corpus e cross join $centCte c),
      ${pfx}asg as materialized (select vec_id, c_id as cluster from ${pfx}ra where rn = 1),
      ${pfx}pr as (${probeOverride.getOrElse(
        s"""select vec_id as q_id, c_id as cluster
                   from ${pfx}ra where ($queryPred) and rn <= $nprobe""")}),
      ${pfx}res as (
        select e.vec_id,
               [e.embedding[i]::double - c.c_emb[i]::double
                for i in range(1,65)] as rv
        from $corpus e
        join ${pfx}asg a on a.vec_id = e.vec_id
        join $centCte c on c.c_id = a.cluster),
      ${pfx}vm as materialized (
        select vec_id, t.m,
               [rv[t.m*$PSUB+i] for i in range(1,${PSUB + 1})] as sub
        from ${pfx}res, unnest(range(0,$PM)) t(m)),$trainCtes
      ${pqTrainChain(s"${pfx}t", trainVm)},
      ${pfx}vd as (
        select v.vec_id, v.m, cb.k,
               round(list_sum([(sub[j]-csub[j])*(sub[j]-csub[j])
                 for j in range(1,${PSUB + 1})]), 4) as d2
        from ${pfx}vm v join ${pfx}tcb$QITERS cb using (m)),
      ${pfx}codes as (
        select vec_id, m, k as code from ${pfx}vd
        qualify row_number() over (partition by vec_id, m order by d2, k) = 1),
      ${pfx}qres as (
        select p.q_id, p.cluster,
               [e.embedding[i]::double - c.c_emb[i]::double
                for i in range(1,65)] as rv
        from ${pfx}pr p
        join $corpus e on e.vec_id = p.q_id
        join $centCte c on c.c_id = p.cluster),
      ${pfx}qrm as (
        select q_id, cluster, t.m,
               [rv[t.m*$PSUB+i] for i in range(1,${PSUB + 1})] as sub
        from ${pfx}qres, unnest(range(0,$PM)) t(m)),
      ${pfx}lut as (
        select q.q_id, q.cluster, q.m, cb.k,
               round(list_sum([(sub[j]-csub[j])*(sub[j]-csub[j])
                 for j in range(1,${PSUB + 1})]), 4) as d2
        from ${pfx}qrm q join ${pfx}tcb$QITERS cb using (m)),
      ${pfx}sc as (
        select l.q_id, c.vec_id, round(sum(l.d2), 4) as adist
        from ${pfx}codes c
        join ${pfx}asg a on a.vec_id = c.vec_id
        join ${pfx}lut l on l.cluster = a.cluster and l.m = c.m and l.k = c.code
        where c.vec_id <> l.q_id${candPred.map(p => s" and ($p)").getOrElse("")}
        group by 1, 2),
      ${pfx}r as (select q_id, vec_id, adist,
              row_number() over (partition by q_id order by adist, vec_id)::bigint as rank
              from ${pfx}sc)"""
  }

  /** One unrolled batch of c84's embedding-gate replay (CTE list,
    * no leading comma) — c67Batch's novelty structure at VECTOR
    * grain: capped within-batch bucket candidates + uncapped cross
    * probes against the keepers accumulated through batch i−1,
    * verified rounded cosine (the cosN spelling the whole similarity
    * tier pins), per-batch connected components, keepers-win
    * clusters, the grown keeper set. Mirrors
    * EmbedDupStream.batchDecisions clause for clause.
    *
    * `membership` swaps the batch-membership SQL (default: the
    * mod-slice of the embeddings corpus); `prevOverride` swaps the
    * keeper-chain CTE probed. The five-gate replay (c85) feeds the
    * LEXICAL gate's batch keeps in as membership and chains keepers
    * through the semantic admissions — this CTE list is reused
    * verbatim (one oracle spelling for the standalone gate and the
    * composed pipeline). */
  private def c84Batch(i: Int, nBatches: Int,
      membership: Option[String] = None, prevOverride: Option[String] = None): String = {
    val prev = prevOverride.getOrElse(if (i == 0) "ekeep_m1" else s"ekeep${i - 1}")
    val member = membership.getOrElse(
      s"select vec_id from embeddings where vec_id % $nBatches = $i")
    s"""
      vb$i as materialized ($member),
      ebb$i as materialized (select s.vec_id, s.bucket from sigv s join vb$i using (vec_id)),
      ecb$i as (select vec_id, bucket from ebb$i
                qualify count(*) over (partition by bucket) <= $CAP),
      ewc$i as (select a.vec_id as va, b.vec_id as vb from ecb$i a join ecb$i b
                on a.bucket = b.bucket and a.vec_id < b.vec_id),
      exc$i as (select distinct bb.vec_id as va, kb.vec_id as vb
                from ebb$i bb
                join (select s2.bucket, s2.vec_id from sigv s2 join $prev using (vec_id)) kb
                  on bb.bucket = kb.bucket),
      evp$i as materialized (
        select va, vb from (
          select c.va, c.vb, ${cosN("ea.embedding", "eb.embedding")} as cos
          from (select va, vb from ewc$i union select va, vb from exc$i) c
          join embeddings ea on ea.vec_id = c.va
          join embeddings eb on eb.vec_id = c.vb)
        where cos >= $SEMTH),
      eed$i as materialized (select va as a, vb as b from evp$i
               union select vb as a, va as b from evp$i),
      ereach$i(a, b) as (
        select a, b from eed$i
        union
        select r.a, e.b from ereach$i r join eed$i e on r.b = e.a where e.b <> r.a),
      elab$i as materialized (select a as node, least(a, min(b)) as comp from ereach$i group by a),
      eperc$i as materialized (
        select l.comp,
               min(case when kp.vec_id is not null then l.node end) as min_keeper,
               min(case when kp.vec_id is null then l.node end) as anchor
        from elab$i l left join $prev kp on kp.vec_id = l.node
        group by l.comp),
      edec$i as materialized (
        select s.vec_id,
               case when l.node is null then true
                    when p.min_keeper is not null then false
                    when p.anchor <> s.vec_id then false
                    else true end as admitted,
               cast(case when l.node is null then null
                    when p.min_keeper is not null then p.min_keeper
                    when p.anchor <> s.vec_id then p.anchor
                    else null end as bigint) as dup_of
        from vb$i s
        left join elab$i l on l.node = s.vec_id
        left join eperc$i p on p.comp = l.comp),
      ekeep$i as materialized (select vec_id from $prev union all
                    select vec_id from edec$i where admitted)"""
  }

  /** c84's full oracle: the live embedding gate's admission history
    * replayed batch-for-batch at rest. The bucket CTE is c5's sign
    * arithmetic WITHOUT the corpus-level cap (the gate caps within
    * the batch only; ecb applies that per poll). */
  private def c84Sql(nBatches: Int): String = {
    val bits = (0 until graft.streaming.EmbedDupStream.SignBits)
      .map(d => s"(case when embedding[${d + 1}] >= 0 then ${1L << d} else 0 end)")
      .mkString("\n          + ")
    s"""
      with recursive
      sigv as materialized (
        select vec_id, $bits as bucket
        from embeddings),
      ekeep_m1 as (select cast(null as bigint) as vec_id where 1 = 0),
      ${(0 until nBatches).map(i => c84Batch(i, nBatches)).mkString(",")}
      select vec_id, admitted, dup_of
      from (${(0 until nBatches).map(i => s"select * from edec$i").mkString(" union all ")})
      order by vec_id
    """
  }

  /** One unrolled batch of c157's sketch-gate replay — c84Batch's
    * structure with the two-tier verification: sketch cosine against
    * threshold ± the c145-audit band, full cosine only deciding the
    * escalation sliver. Buckets come from the SKETCH's sign bits
    * (sigp), so candidate generation is also sketch-grain. */
  private def c157Batch(i: Int, nBatches: Int): String = {
    val prev = if (i == 0) "skeep_m1" else s"skeep${i - 1}"
    val th = graft.operators.Similarity.SemDedupThreshold
    val cosNK = this.cosNK(graft.operators.Similarity.JlDim) _
    s"""
      svb$i as materialized (select vec_id from embeddings where vec_id % $nBatches = $i),
      sbb$i as materialized (select s.vec_id, s.bucket from sigp s join svb$i using (vec_id)),
      scb$i as (select vec_id, bucket from sbb$i
                qualify count(*) over (partition by bucket) <= $CAP),
      swc$i as (select a.vec_id as va, b.vec_id as vb from scb$i a join scb$i b
                on a.bucket = b.bucket and a.vec_id < b.vec_id),
      sxc$i as (select distinct bb.vec_id as va, kb.vec_id as vb
                from sbb$i bb
                join (select s2.bucket, s2.vec_id from sigp s2 join $prev using (vec_id)) kb
                  on bb.bucket = kb.bucket),
      svp$i as materialized (
        select va, vb from (
          select c.va, c.vb,
                 ${cosNK("pa.p", "pb.p")} as cp,
                 ${cosN("ea.embedding", "eb.embedding")} as cf
          from (select va, vb from swc$i union select va, vb from sxc$i) c
          join prj157 pa on pa.vec_id = c.va
          join prj157 pb on pb.vec_id = c.vb
          join embeddings ea on ea.vec_id = c.va
          join embeddings eb on eb.vec_id = c.vb)
        cross join bd157
        where cp >= $th + band or (cp >= $th - band and cf >= $th)),
      sed$i as materialized (select va as a, vb as b from svp$i
               union select vb as a, va as b from svp$i),
      sreach$i(a, b) as (
        select a, b from sed$i
        union
        select r.a, e.b from sreach$i r join sed$i e on r.b = e.a where e.b <> r.a),
      slab$i as materialized (select a as node, least(a, min(b)) as comp from sreach$i group by a),
      sperc$i as materialized (
        select l.comp,
               min(case when kp.vec_id is not null then l.node end) as min_keeper,
               min(case when kp.vec_id is null then l.node end) as anchor
        from slab$i l left join $prev kp on kp.vec_id = l.node
        group by l.comp),
      sdec$i as materialized (
        select s.vec_id,
               case when l.node is null then true
                    when p.min_keeper is not null then false
                    when p.anchor <> s.vec_id then false
                    else true end as admitted,
               cast(case when l.node is null then null
                    when p.min_keeper is not null then p.min_keeper
                    when p.anchor <> s.vec_id then p.anchor
                    else null end as bigint) as dup_of
        from svb$i s
        left join slab$i l on l.node = s.vec_id
        left join sperc$i p on p.comp = l.comp),
      skeep$i as materialized (select vec_id from $prev union all
                    select vec_id from sdec$i where admitted)"""
  }

  /** c157's full oracle: the sketch-served gate's admission history
    * replayed batch-for-batch — the corpus-wide projection, the
    * audit-grid band (c147's exact-rank spelling), sketch-sign
    * buckets, the unrolled two-tier batches. */
  private def c157Sql(nBatches: Int): String = {
    val k = graft.operators.Similarity.JlDim
    val cosNK = this.cosNK(k) _
    val bits = (0 until graft.streaming.EmbedDupStream.SignBits)
      .map(d => s"(case when p[${d + 1}] >= 0 then ${1L << d} else 0 end)")
      .mkString("\n          + ")
    s"""
      with recursive
      prj157 as materialized (
        select vec_id, embedding, ${jlProjList(k)} as p from embeddings),
      a157x as (select vec_id, embedding as v, p from prj157 where vec_id < $NQ),
      err157 as (
        select round(abs(${cosN("a.v", "b.v")}
                 - ${cosNK("a.p", "b.p")}), 4) as abs_err
        from a157x a join a157x b on a.vec_id < b.vec_id
        where ${cosN("a.v", "b.v")} is not null
          and ${cosNK("a.p", "b.p")} is not null),
      bd157 as (
        select abs_err as band from (
          select abs_err, row_number() over (order by abs_err) as rk,
                 count(*) over () as n
          from err157)
        where rk = ((n * ${graft.operators.Similarity.JlBandPct} + 99) // 100)),
      sigp as materialized (select vec_id, $bits as bucket from prj157),
      skeep_m1 as (select cast(null as bigint) as vec_id where 1 = 0),
      ${(0 until nBatches).map(i => c157Batch(i, nBatches)).mkString(",")}
      select vec_id, admitted, dup_of
      from (${(0 until nBatches).map(i => s"select * from sdec$i").mkString(" union all ")})
      order by vec_id
    """
  }

  /** c158: the sketch-routed two-stage serve — corpus-wide
    * projection, sketch-cosine stage-1 window at `depth`, exact
    * full-width rerank at `topK` (c113's shape with the sketch as
    * stage 1 instead of the ADC index). */
  private def c158Sql: String = {
    val k = graft.operators.Similarity.JlDim
    val depth = graft.operators.Similarity.RerankDepth
    val topK = graft.operators.Similarity.PqTopK
    val cosNK = this.cosNK(k) _
    s"""
      with pr158 as materialized (
        select vec_id, ${jlProjList(k)} as p from embeddings),
      q158 as (select vec_id as q_id, p as qp from pr158 where vec_id < $NQ),
      s158 as (
        select q.q_id, c.vec_id,
               row_number() over (partition by q.q_id
                 order by ${cosNK("q.qp", "c.p")} desc nulls last, c.vec_id)::bigint
                 as sk_rank
        from pr158 c cross join q158 q
        where c.vec_id <> q.q_id
        qualify sk_rank <= $depth),
      r158 as (
        select s.q_id, s.vec_id, s.sk_rank,
               ${cosN("eq.embedding", "ec.embedding")} as cos,
               row_number() over (partition by s.q_id
                 order by ${cosN("eq.embedding", "ec.embedding")} desc nulls last,
                          s.vec_id)::bigint as rank
        from s158 s
        join embeddings eq on eq.vec_id = s.q_id
        join embeddings ec on ec.vec_id = s.vec_id
        qualify rank <= $topK)
      select q_id, rank, vec_id, sk_rank, cos
      from r158 order by q_id, rank
    """
  }

  /** c159: the band-health monitor — per vintage (base / full), the
    * two-tier gate's candidate mass per tier and the escalated
    * admissions, with the band computed ONCE from the full-corpus
    * audit grid (the shipped artifact, both legs). */
  private def c159Sql: String = {
    val k = graft.operators.Similarity.JlDim
    val th = graft.operators.Similarity.SemDedupThreshold
    val cosNK = this.cosNK(k) _
    val pBits = (0 until graft.operators.Similarity.DefaultSignBits)
      .map(d => s"(case when p[${d + 1}] >= 0 then ${1L << d} else 0 end)")
      .mkString("\n          + ")
    val basePred =
      s"not (vec_id % 5 = 0 and vec_id >= ${graft.operators.Similarity.IndexBaseBoundary})"
    def leg(sfx: String, pred: String, vintage: String) = s"""
      e$sfx as (select vec_id, embedding from embeddings where $pred),
      pr$sfx as (select vec_id, ${jlProjList(k)} as p from e$sfx),
      v$sfx as (
        select vec_id, p, $pBits as bucket
        from pr$sfx
        qualify count(*) over (partition by bucket) <= $CAP),
      sc$sfx as (
        select a.vec_id as va, b.vec_id as vb, ${cosNK("a.p", "b.p")} as cp
        from v$sfx a join v$sfx b
          on a.bucket = b.bucket and a.vec_id < b.vec_id),
      ea$sfx as (
        select (count(*) filter (where s.cp >= $th - band and s.cp < $th + band
                 and ${cosN("x.embedding", "y.embedding")} >= $th))::bigint as n_esc_admit
        from sc$sfx s
        cross join bd159
        join embeddings x on x.vec_id = s.va
        join embeddings y on y.vec_id = s.vb),
      ag$sfx as (
        select '$vintage' as vintage,
               count(*)::bigint as n_cand,
               (count(*) filter (where cp >= $th + band))::bigint as n_proj,
               (count(*) filter (where cp >= $th - band and cp < $th + band))::bigint as n_esc,
               (count(*) filter (where cp is null or cp < $th - band))::bigint as n_reject
        from sc$sfx cross join bd159),
      r$sfx as (
        select a.vintage, a.n_cand, a.n_proj, a.n_esc, e.n_esc_admit, a.n_reject,
               round(a.n_proj::double / a.n_cand, 4) as proj_frac,
               round(a.n_esc::double / a.n_cand, 4) as esc_frac
        from ag$sfx a, ea$sfx e)"""
    s"""
      with prA159 as (
        select vec_id, embedding as v, ${jlProjList(k)} as p
        from embeddings where vec_id < $NQ),
      err159 as (
        select round(abs(${cosN("a.v", "b.v")}
                 - ${cosNK("a.p", "b.p")}), 4) as abs_err
        from prA159 a join prA159 b on a.vec_id < b.vec_id
        where ${cosN("a.v", "b.v")} is not null
          and ${cosNK("a.p", "b.p")} is not null),
      bd159 as (
        select abs_err as band from (
          select abs_err, row_number() over (order by abs_err) as rk,
                 count(*) over () as n
          from err159)
        where rk = ((n * ${graft.operators.Similarity.JlBandPct} + 99) // 100)),
      ${leg("159b", basePred, "base")},
      ${leg("159f", "1 = 1", "full")}
      select * from r159b union all select * from r159f
      order by vintage
    """
  }

  /** c60's coarse-quantizer CTEs (cc / ranked_assign / assigned60),
    * shared by the c65 residual chain and the c66 audit — the exact
    * ranking spelling the kernels' ivfTopClusters pins. */
  private val IVF_ASSIGN = s"""
      cc as (select vec_id as c_id, embedding as c_emb from embeddings where vec_id < $NC),
      ranked_assign as (
        select e.vec_id, cc.c_id,
               row_number() over (partition by e.vec_id
                 order by ${cosN("e.embedding", "cc.c_emb")} desc nulls last, cc.c_id) as rn
        from embeddings e cross join cc),
      assigned60 as (select vec_id, c_id as cluster from ranked_assign where rn = 1)"""

  /** One unrolled batch of c67's novelty replay (CTE list, no leading
    * comma): batch survivors' bands, capped within-batch candidates +
    * uncapped cross probes against the keepers accumulated through
    * batch i−1, verified-Jaccard pairs, per-batch connected
    * components (its own recursive CTE — the keeper set feeding batch
    * i+1 depends on batch i's components, so the closure cannot be
    * shared), keepers-win-clusters decisions, and the grown keeper
    * set. Mirrors NearDupStream.batchDecisions clause for clause.
    *
    * `prevOverride` swaps the keeper-set CTE the batch probes
    * (default: the lexical gate's own keepset chain); `emitKeepset`
    * false suppresses the keepset$i CTE — the five-gate replay (c85)
    * grows its keeper chain from the SEMANTIC gate's admissions, not
    * the lexical gate's. */
  private def c67Batch(i: Int, nBatches: Int,
      prevOverride: Option[String] = None, emitKeepset: Boolean = true): String = {
    val prev = prevOverride.getOrElse(if (i == 0) "keepset_m1" else s"keepset${i - 1}")
    val bar = graft.streaming.NearDupStream.JaccardThreshold
    s"""
      s2b$i as materialized (select doc_id from s2 where doc_id % $nBatches = $i),
      bb$i as materialized (select b.doc_id, b.band_key from bandsS b join s2b$i using (doc_id)),
      cb$i as materialized (select doc_id, band_key from bb$i
               qualify count(*) over (partition by band_key) <= $CAP),
      wc$i as (select distinct a.doc_id as doc_a, b.doc_id as doc_b
               from cb$i a join cb$i b on a.band_key = b.band_key and a.doc_id < b.doc_id),
      xc$i as (select distinct bb.doc_id, kb.doc_id as keeper_id
               from bb$i bb
               join (select b2.band_key, b2.doc_id from bandsS b2 join $prev using (doc_id)) kb
                 on bb.band_key = kb.band_key),
      vp$i as materialized (
        select doc_a, doc_b from (
          select w.doc_a, w.doc_b,
                 round((len(sa.sh) + len(sb.sh) - u.uni)::double / u.uni, 4) as jac
          from wc$i w
          join setsS sa on w.doc_a = sa.doc_id
          join setsS sb on w.doc_b = sb.doc_id,
          lateral (select len(list_distinct(list_concat(sa.sh, sb.sh))) as uni) u)
        where jac >= $bar
        union all
        select doc_a, doc_b from (
          select x.doc_id as doc_a, x.keeper_id as doc_b,
                 round((len(sa.sh) + len(sb.sh) - u.uni)::double / u.uni, 4) as jac
          from xc$i x
          join setsS sa on x.doc_id = sa.doc_id
          join setsS sb on x.keeper_id = sb.doc_id,
          lateral (select len(list_distinct(list_concat(sa.sh, sb.sh))) as uni) u)
        where jac >= $bar),
      ed$i as materialized (select doc_a as a, doc_b as b from vp$i
               union select doc_b as a, doc_a as b from vp$i),
      reach$i(a, b) as (
        select a, b from ed$i
        union
        select r.a, e.b from reach$i r join ed$i e on r.b = e.a where e.b <> r.a),
      lab$i as materialized (select a as node, least(a, min(b)) as comp from reach$i group by a),
      perc$i as materialized (
        select l.comp,
               min(case when kp.doc_id is not null then l.node end) as min_keeper,
               min(case when kp.doc_id is null then l.node end) as anchor
        from lab$i l left join $prev kp on kp.doc_id = l.node
        group by l.comp),
      nd$i as materialized (
        select s.doc_id,
               case when l.node is null then 'keep'
                    when p.min_keeper is not null then 'duplicate'
                    when p.anchor <> s.doc_id then 'duplicate'
                    else 'keep' end as stage,
               cast(case when l.node is null then null
                    when p.min_keeper is not null then p.min_keeper
                    when p.anchor <> s.doc_id then p.anchor
                    else null end as bigint) as dup_of
        from s2b$i s
        left join lab$i l on l.node = s.doc_id
        left join perc$i p on p.comp = l.comp)${if (emitKeepset) s""",
      keepset$i as materialized (select doc_id from $prev union all
                    select doc_id from nd$i where stage = 'keep')""" else ""}"""
  }

  /** c67's full oracle: the two stateless gates decided per doc (c50's
    * cascade spelling, c35's Bloom probe), then the stateful novelty
    * gate unrolled batch-for-batch. */
  /** c67's complete decision chain (CTE list incl. the leading
    * `recursive` keyword is supplied by the caller) — shared by the
    * c67 audit and the c77 four-gate pipeline, which extends it with
    * the span gate over each batch's admitted docs. */
  private def c67Chain(nBatches: Int, qDef: Option[String] = None): String = s"""
      ${c67Stateless(qDef = qDef)},
      keepset_m1 as (select cast(null as bigint) as doc_id where 1 = 0),
      ${(0 until nBatches).map(i => c67Batch(i, nBatches)).mkString(",")},
      ${c67Alldec((0 until nBatches).map(i =>
        s"union all select doc_id, stage, dup_of from nd$i").mkString(" "))}"""

  /** The funnel's batch-independent CTEs — the two stateless gates
    * (quality cascade, Bloom leakage) decided per doc, plus the
    * shingle/signature/band tables every novelty batch reads. Shared
    * by the c67/c77 replays and the five-gate c85, whose population
    * additionally requires an embedding (the door embeds on arrival —
    * only docs WITH a vector can contest the semantic gate). */
  private def c67Stateless(
      pop: String = "select doc_id, text from documents where doc_id % 97 <> 0",
      qDef: Option[String] = None): String = {
    val maxFrac = graft.streaming.DecontamStream.MaxFlaggedFrac
    s"""
      pop as materialized ($pop),
      sig as materialized (
        select doc_id,
               len(w) as n_tokens,
               round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) as en_score,
               round(((length(text) - length(replace(text, 'th', ''))) / 2
                    + (length(text) - length(replace(text, 'he', ''))) / 2
                    + (length(text) - length(replace(text, 'in', ''))) / 2
                    + (length(text) - length(replace(text, 'er', ''))) / 2
                     )::double / length(text), 4) as en_ngram_score,
               round(len(list_distinct(w))::double / len(w), 4) as distinct_ratio,
               len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+'))
                 + len(regexp_extract_all(text, '[0-9]+')) as n_pii
        from (select doc_id, text, string_split(text, ' ') as w from pop)),
      q as materialized (${qDef.getOrElse("""
        select doc_id,
               case when n_tokens < 5 then 'too_short'
                    when not (en_score > 0.01 or en_ngram_score > 0.02) then 'non_en'
                    when distinct_ratio < 0.3 then 'repetitive'
                    when n_pii > 20 then 'pii_heavy'
                    else 'keep' end as qreason
        from sig""")}),
      shs as materialized (
        select doc_id, s, substr(md5(s), 1, 8) as sh8
        from (select distinct doc_id, s from ($SHINGLES))),
      bench as materialized (select distinct sh8 from shs where doc_id % 97 = 0),
      bits as materialized (
        select distinct ('0x' || substr(md5(sh8), 1 + 7*i, 7))::bigint % $BLOOM_M as pos
        from bench, unnest(range(0,$BLOOM_K)) as t(i)),
      probe as materialized (
        select shs.doc_id, shs.s,
               ('0x' || substr(md5(sh8), 1 + 7*i, 7))::bigint % $BLOOM_M as pos
        from shs join q on q.doc_id = shs.doc_id and q.qreason = 'keep'
        , unnest(range(0,$BLOOM_K)) as t(i)),
      per_sh as materialized (
        select probe.doc_id, probe.s,
               count(*) as n_pos, count(bits.pos) as n_hit
        from probe left join bits on probe.pos = bits.pos
        group by probe.doc_id, probe.s),
      ff as materialized (
        select doc_id,
               round((count(*) filter (where n_hit = n_pos))::double / count(*), 4) as flagged_frac
        from per_sh group by doc_id),
      contam as materialized (
        select q.doc_id from q join ff using (doc_id)
        where q.qreason = 'keep' and ff.flagged_frac > $maxFrac),
      s2 as materialized (
        select q.doc_id from q left join ff using (doc_id)
        where q.qreason = 'keep' and coalesce(ff.flagged_frac, 0) <= $maxFrac),
      dS as materialized (select p.doc_id, p.text from pop p join s2 using (doc_id)),
      shdS as materialized (select distinct doc_id, s from (
        select doc_id, unnest([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)]) as s
        from (select doc_id, string_split(text, ' ') as w from dS))),
      mhS as materialized (
        select doc_id, i,
               min(case when i < ${MHK / 2} then substr(md5('0' || '|' || s), i*4 + 1, 4)
                        else substr(md5('1' || '|' || s), (i-${MHK / 2})*4 + 1, 4) end) as v
        from shdS, unnest(range(0,$MHK)) as t(i)
        group by doc_id, i),
      sigS as materialized (select doc_id, list(v order by i) as sig from mhS group by doc_id),
      bandsS as materialized (
        select doc_id, md5($BAND_KEY) as band_key
        from sigS, unnest(range(0,$BANDS)) as t(j)),
      setsS as materialized (select doc_id, list(s) as sh from shdS group by doc_id)"""
  }

  /** The funnel's decision union — stateless drops + the per-batch
    * novelty/semantic rows supplied by the caller. */
  private def c67Alldec(batchRows: String): String = s"""
      alldec as (
        select doc_id, qreason as stage, cast(null as bigint) as dup_of
        from q where qreason <> 'keep'
        union all
        select doc_id, 'contaminated', cast(null as bigint) from contam
        $batchRows)"""

  private def c67Sql(nBatches: Int): String = s"""
      with recursive
      ${c67Chain(nBatches)}
      select doc_id, stage, dup_of from alldec order by doc_id
    """

  /** c77's oracle: c67's full funnel replay EXTENDED with the span
    * gate over each batch's ADMITTED docs — postings only ever come
    * from kept docs (the real pipeline's shape: refused docs never
    * enter the index), the batch-dependent cap runs over the KEPT
    * posting history (c72's cumulative spelling on the kept slice),
    * and the accumulated cuts island-merge onto the decision rows. */
  private def c77Sql(nBatches: Int): String = s"""
      with recursive
      ${c67Chain(nBatches)},
      ${spanBlock((0 until nBatches).map(i =>
        s"select doc_id, $i as g from nd$i where stage = 'keep'").mkString(" union all "))}
      select d.doc_id, d.stage, d.dup_of,
             coalesce(c.cut_tokens, 0)::bigint as cut_tokens
      from alldec d left join cut77 c using (doc_id)
      order by d.doc_id
    """

  /** The span gate's at-rest replay (CTE list ending with cut77, no
    * trailing comma) over a caller-supplied admitted-docs-per-batch
    * table (doc_id, g) — c77's lower half, shared with the five-gate
    * c85: positional shingles of the kept docs, the batch-dependent
    * cumulative occurrence cap, earlier-batch-only probes, diagonal
    * run collapse, island merge, per-doc cut totals. */
  private def spanBlock(kdocSql: String): String = {
    val w = graft.operators.Dedup.SpanShingleW
    val occ = graft.operators.Dedup.SpanOccCap
    val minSpan = graft.operators.Dedup.SpanMinTokens
    s"""
      kdoc as materialized ($kdocSql),
      d77 as (select p.doc_id, k.g, string_split(p.text, ' ') as w0
              from pop p join kdoc k using (doc_id)),
      sh77 as materialized (
        select doc_id, g, p as pos,
               substr(md5(array_to_string(w0[p+1:p+$w], ' ')), 1, 16) as key
        from d77, lateral (select unnest(range(0, len(w0) - ${w - 1})) as p) t),
      kc77 as materialized (select key, g, count(*) as n from sh77 group by key, g),
      kcum77 as (
        select key, g, n,
               coalesce(sum(n) over (partition by key order by g
                 rows between unbounded preceding and 1 preceding), 0) as ns
        from kc77),
      okk77 as materialized (
        select key, g from kcum77 where ns >= 1 and n + ns <= $occ),
      pr77 as (
        select kb.doc_id as doc_keep, kb.pos as pos_keep,
               dl.doc_id as doc_cut, dl.pos as pos_cut
        from okk77 k
        join sh77 dl on dl.key = k.key and dl.g = k.g
        join sh77 kb on kb.key = k.key and kb.g < k.g
        where kb.doc_id <> dl.doc_id),
      runs77 as (
        select doc_keep, doc_cut, pos_cut - pos_keep as diag, pos_keep, pos_cut,
               pos_cut - row_number() over (
                 partition by doc_keep, doc_cut, pos_cut - pos_keep order by pos_cut) as grp
        from pr77),
      spans77 as (
        select doc_cut, doc_keep, min(pos_cut) as cut_start,
               min(pos_keep) as keep_start,
               count(*) + ${w - 1} as n_tokens
        from runs77 group by doc_keep, doc_cut, diag, grp
        having count(*) + ${w - 1} >= $minSpan),
      iv77 as (select doc_cut as doc_id, cut_start as s, cut_start + n_tokens as e
               from spans77),
      m77 as (
        select doc_id, s, e,
               max(e) over (partition by doc_id order by s, e
                 rows between unbounded preceding and 1 preceding) as maxe
        from iv77),
      isl77 as (
        select doc_id, s, e,
               sum(case when maxe is null or s > maxe then 1 else 0 end)
                 over (partition by doc_id order by s, e) as island
        from m77),
      r77 as (select doc_id, island, min(s) as cs, max(e) as ce
              from isl77 group by doc_id, island),
      cut77 as (select doc_id, sum(ce - cs)::bigint as cut_tokens
                from r77 group by doc_id)"""
  }

  /** c85's oracle: the FIVE-gate live pipeline replayed at rest —
    * c67's stateless gates, then per batch: the lexical novelty
    * replay (c67Batch) probing the FINAL keeper chain, the embedding
    * admission replay (c84Batch) whose membership is exactly that
    * batch's lexical keeps, and the keeper chain grown from the
    * SEMANTIC admissions (only docs every gate admitted are corpus);
    * the span tier (c77's spanBlock) runs over the final keeps. One
    * oracle spelling per gate — each block is the standalone audit's
    * own CTE generator, parameterized, so the composed replay cannot
    * drift from the per-gate ones. */
  private def c85Sql(nBatches: Int): String =
    s"with recursive ${c85Body(nBatches)}"

  /** c85's replay minus the WITH keyword — parameterized on the
    * quality stage's CTE so c121 can interpose the student classifier
    * (the exact c96 factoring, one gate chain deeper). */
  private def c85Body(nBatches: Int, qDef: Option[String] = None): String = s"""
      ${c85Ctes(nBatches, qDef)}
      select d.doc_id, d.stage, d.dup_of,
             coalesce(c.cut_tokens, 0)::bigint as cut_tokens
      from alldec d left join cut77 c using (doc_id)
      order by d.doc_id
    """

  /** The five-gate replay's CTE list alone (no final select) —
    * c85Body's chain, shared with the c174 store-inventory audit,
    * which reads DIFFERENT terminal frames (per-store key sets) off
    * the same replay. */
  private def c85Ctes(nBatches: Int, qDef: Option[String] = None): String = {
    val bits = (0 until graft.streaming.EmbedDupStream.SignBits)
      .map(d => s"(case when embedding[${d + 1}] >= 0 then ${1L << d} else 0 end)")
      .mkString("\n          + ")
    val batches = (0 until nBatches).map { i =>
      val prevFk = if (i == 0) "fk_m1" else s"fk${i - 1}"
      s"""
      ${c67Batch(i, nBatches, Some(prevFk), emitKeepset = false)},
      ${c84Batch(i, nBatches,
        Some(s"select doc_id as vec_id from nd$i where stage = 'keep'"))},
      fk$i as (select vec_id as doc_id from ekeep$i)"""
    }.mkString(",")
    s"""
      ${c67Stateless("""select d.doc_id, d.text from documents d
        join embeddings e on e.vec_id = d.doc_id where d.doc_id % 97 <> 0""", qDef)},
      sigv as materialized (
        select vec_id, $bits as bucket
        from embeddings),
      fk_m1 as (select cast(null as bigint) as doc_id where 1 = 0),
      ekeep_m1 as (select cast(null as bigint) as vec_id where 1 = 0),
      $batches,
      ${c67Alldec((0 until nBatches).map(i =>
        s"""union all select doc_id, stage, dup_of from nd$i where stage <> 'keep'
            union all select vec_id as doc_id,
                             case when admitted then 'keep' else 'semantic_dup' end,
                             dup_of from edec$i""").mkString(" "))},
      ${spanBlock((0 until nBatches).map(i =>
        s"select vec_id as doc_id, $i as g from edec$i where admitted")
        .mkString(" union all "))}"""
  }

  /** c121: the five-gate replay (c85's body verbatim) with the
    * quality stage swapped to the trained classifier — c96's student
    * qDef (the c88 chain's final weights scoring every doc) composed
    * into the five-gate history. One oracle spelling per gate; the
    * student swap is exactly the CTE c96 already pins. */
  private def c121Sql: String = {
    import graft.operators.TextAnalysis._
    val steps = QcTrainSteps
    val n = graft.streaming.FunnelStream.AuditBatches
    val studentQ = s"""
        select sig.doc_id,
               case when sc.score < $QcThreshold then 'low_quality'
                    else 'keep' end as qreason
        from sig join scored121 sc using (doc_id)"""
    s"""
      with recursive ${c88Chain(steps, "q", "")},
      scored121 as materialized (
        select t.doc_id,
               round(1.0 / (1.0 + exp(-((w.w0 / 1000000.0) * x0 + (w.w1 / 1000000.0) * x1
                 + (w.w2 / 1000000.0) * x2 + (w.w3 / 1000000.0) * x3
                 + (w.w4 / 1000000.0) * x4 + (w.w5 / 1000000.0)))), 4) as score
        from tq t cross join w${steps}q w),
      ${c85Body(n, Some(studentQ))}
    """
  }

  /** c174: the five-gate door's post-compaction store inventory
    * re-derived from the raw arrival history — the c85 replay's CTEs
    * with per-store terminal frames: decisions = alldec, keep/vecs =
    * the final keeper union, bands = the keepers' uncapped band rows,
    * buckets = their sign buckets, spans/postings = the span tier's
    * accumulated rows (spans77 / sh77). Each store contributes one
    * (store, n_rows, key_checksum) row, the checksum the bit_xor over
    * the store's own merge-key string — the exact spelling the
    * compacted parquet carries. */
  private def c174Sql: String = {
    val n = graft.streaming.FunnelStream.AuditBatches
    def chk(e: String) = s"bit_xor(('0x' || substr(md5($e), 1, 15))::bigint)"
    s"""
      with recursive ${c85Ctes(n)},
      fk174 as materialized (select doc_id from fk${n - 1}),
      rows174 as (
        select 'bands' as store, count(*)::bigint as n_rows,
               ${chk("b.band_key || ':' || b.doc_id::varchar")} as key_checksum
        from bandsS b join fk174 using (doc_id)
        union all
        select 'buckets', count(*)::bigint,
               ${chk("s.bucket::varchar || ':' || s.vec_id::varchar")}
        from sigv s join fk174 f on s.vec_id = f.doc_id
        union all
        select 'decisions', count(*)::bigint, ${chk("doc_id::varchar")}
        from alldec
        union all
        select 'keep', count(*)::bigint, ${chk("doc_id::varchar")}
        from fk174
        union all
        select 'postings', count(*)::bigint,
               ${chk("key || ':' || doc_id::varchar || ':' || pos::varchar")}
        from sh77
        union all
        select 'spans', count(*)::bigint,
               ${chk("doc_cut::varchar || ':' || doc_keep::varchar || ':' || cut_start::varchar || ':' || keep_start::varchar")}
        from spans77
        union all
        select 'vecs', count(*)::bigint, ${chk("doc_id::varchar")}
        from fk174)
      select store, n_rows, key_checksum from rows174 order by store
    """
  }

  /** c125: the fusion-tier recall audit — c118's full replay (the
    * trained chain at fusion queries/depth, the exact refine, the
    * lexical leg, the RRF combine) plus the exact-cosine ground
    * truth, three per-query hit counts at report grain. */
  private def c125Sql: String = {
    val c = graft.operators.Similarity.RrfC
    val k = graft.operators.Similarity.RrfTopK
    val qb = graft.operators.Similarity.RrfQueryBound
    val depth = graft.operators.Similarity.RerankDepth
    s"""
      with $rrfLexCtes,
      $TRAINED_CENTROIDS,
      ${residualServeChain("y", s"cent$QITERS",
        queryPred = s"vec_id % 101 = 0 and vec_id < $qb",
        candPred = Some("c.vec_id % 101 <> 0"))},
      cand118 as (select q_id, vec_id, rank as adc_rank from yr where rank <= $depth),
      eq118 as (select vec_id as q_id, embedding as q_emb from embeddings
                where vec_id % 101 = 0 and vec_id < $qb),
      ex118 as (
        select c.q_id, c.vec_id, c.adc_rank, ${cosN("eq118.q_emb", "e.embedding")} as cos
        from cand118 c
        join embeddings e on c.vec_id = e.vec_id
        join eq118 on c.q_id = eq118.q_id),
      semr118 as (
        select q_id, vec_id as doc_id, sem_rank, adc_rank from (
          select q_id, vec_id, adc_rank,
                 row_number() over (partition by q_id
                   order by cos desc nulls last, vec_id)::bigint as sem_rank
          from ex118)
        where sem_rank <= $k),
      f118 as (
        select coalesce(l.q_id, s.q_id) as q_id,
               coalesce(l.doc_id, s.doc_id) as doc_id,
               lex_rank, sem_rank,
               round(coalesce(1.0::double / ($c + lex_rank), 0)
                   + coalesce(1.0::double / ($c + sem_rank), 0), 6) as rrf
        from lexr l full outer join semr118 s on l.q_id = s.q_id and l.doc_id = s.doc_id),
      fused125 as (
        select q_id, doc_id from (
          select q_id, doc_id,
                 row_number() over (partition by q_id
                   order by rrf desc, doc_id)::bigint as rank
          from f118)
        where rank <= $k),
      exs125 as (
        select eq118.q_id, e.vec_id as doc_id,
               row_number() over (partition by eq118.q_id
                 order by ${cosN("eq118.q_emb", "e.embedding")} desc nulls last,
                          e.vec_id)::bigint as rk
        from embeddings e cross join eq118
        where e.vec_id % 101 <> 0 and e.vec_id <> eq118.q_id),
      gt125 as (select q_id, doc_id from exs125 where rk <= $k),
      dh125 as (
        select gt125.q_id, count(s.doc_id)::bigint as dense_hits
        from gt125 left join semr118 s
          on s.q_id = gt125.q_id and s.doc_id = gt125.doc_id
        group by gt125.q_id),
      fh125 as (
        select gt125.q_id, count(f.doc_id)::bigint as fused_hits
        from gt125 left join fused125 f
          on f.q_id = gt125.q_id and f.doc_id = gt125.doc_id
        group by gt125.q_id),
      lh125 as (
        select gt125.q_id, count(l.doc_id)::bigint as lex_hits
        from gt125 left join lexr l
          on l.q_id = gt125.q_id and l.doc_id = gt125.doc_id
        group by gt125.q_id)
      select q_id, dense_hits, round(dense_hits::double / $k, 4) as dense_recall,
             fused_hits, round(fused_hits::double / $k, 4) as fused_recall,
             lex_hits, round(lex_hits::double / $k, 4) as lex_recall
      from dh125 join fh125 using (q_id) join lh125 using (q_id)
      order by q_id
    """
  }

  /** One c73 cell: probes at this nprobe (a prefix of the ranked
    * clusters), truncated-code ADC over the per-cluster residual
    * LUTs, top-k, per-query hits. */
  private def c73Cell(np: Int, mb: Int): String = s"""
      s73_${np}x$mb as (
        select l.q_id, c.vec_id,
               round(sum(l.d2) filter (where c.m < $mb), 4) as adist
        from c73codes c
        join c73asg a on a.vec_id = c.vec_id
        join c73pr p on p.cluster = a.cluster and p.rn <= $np
        join c73lut l on l.q_id = p.q_id and l.cluster = a.cluster
                     and l.m = c.m and l.k = c.code
        where c.vec_id <> l.q_id
        group by 1, 2),
      k73_${np}x$mb as (
        select q_id, vec_id from (
          select q_id, vec_id,
                 row_number() over (partition by q_id order by adist, vec_id) as rk
          from s73_${np}x$mb)
        where rk <= $PTOPK),
      h73_${np}x$mb as (
        select q6.q_id, count(ex.vec_id)::bigint as n_hits
        from q6
        left join k73_${np}x$mb a on a.q_id = q6.q_id
        left join ex on ex.q_id = a.q_id and ex.vec_id = a.vec_id
        group by q6.q_id)"""

  /** c73's full oracle: c26's coarse trainer + the residual
    * subquantizer trainer replayed, then one serving cell per
    * (nprobe, code budget), recall vs the exact chain. */
  private def c73Sql: String = {
    val npMax = graft.operators.Similarity.RecallNprobes.max
    s"""
      with $TRAINED_CENTROIDS,
      c73ra as (
        select e.vec_id, c.c_id,
               row_number() over (partition by e.vec_id
                 order by ${cosN("e.embedding", "c.c_emb")} desc nulls last, c.c_id) as rn
        from embeddings e cross join cent$QITERS c),
      c73asg as materialized (select vec_id, c_id as cluster from c73ra where rn = 1),
      c73pr as materialized (select vec_id as q_id, c_id as cluster, rn
                   from c73ra where vec_id < $NQ and rn <= $npMax),
      c73res as (
        select e.vec_id,
               [e.embedding[i]::double - c.c_emb[i]::double
                for i in range(1,65)] as rv
        from embeddings e
        join c73asg a on a.vec_id = e.vec_id
        join cent$QITERS c on c.c_id = a.cluster),
      c73vm as materialized (
        select vec_id, t.m,
               [rv[t.m*$PSUB+i] for i in range(1,${PSUB + 1})] as sub
        from c73res, unnest(range(0,$PM)) t(m)),
      ${pqTrainChain("u", "c73vm")},
      c73vd as (
        select v.vec_id, v.m, cb.k,
               round(list_sum([(sub[j]-csub[j])*(sub[j]-csub[j])
                 for j in range(1,${PSUB + 1})]), 4) as d2
        from c73vm v join ucb$QITERS cb using (m)),
      c73codes as materialized (
        select vec_id, m, k as code from c73vd
        qualify row_number() over (partition by vec_id, m order by d2, k) = 1),
      c73qres as (
        select p.q_id, p.cluster,
               [e.embedding[i]::double - c.c_emb[i]::double
                for i in range(1,65)] as rv
        from c73pr p
        join embeddings e on e.vec_id = p.q_id
        join cent$QITERS c on c.c_id = p.cluster),
      c73qrm as (
        select q_id, cluster, t.m,
               [rv[t.m*$PSUB+i] for i in range(1,${PSUB + 1})] as sub
        from c73qres, unnest(range(0,$PM)) t(m)),
      c73lut as materialized (
        select q.q_id, q.cluster, q.m, cb.k,
               round(list_sum([(sub[j]-csub[j])*(sub[j]-csub[j])
                 for j in range(1,${PSUB + 1})]), 4) as d2
        from c73qrm q join ucb$QITERS cb using (m)),
      q6 as (select vec_id as q_id, embedding as q_emb from embeddings where vec_id < $NQ),
      sc6 as (
        select q6.q_id, e.vec_id,
               ${cosN("q6.q_emb", "e.embedding")} as cos
        from embeddings e cross join q6
        where e.vec_id <> q6.q_id),
      ex as (select q_id, vec_id from (
               select q_id, vec_id,
                      row_number() over (partition by q_id order by cos desc nulls last, vec_id) as rk
               from sc6)
             where rk <= $PTOPK),
      ${c66Grid.map { case (np, mb) => c73Cell(np, mb) }.mkString(",")},
      cells73 as (${c66Grid.map { case (np, mb) =>
        s"select $np::int as nprobe, $mb::int as m_budget, q_id, n_hits from h73_${np}x$mb"
      }.mkString(" union all ")})
      select nprobe, m_budget, count(*) as n_queries,
             round(avg(round(n_hits::double / $PTOPK, 4)), 4) as mean_recall
      from cells73 group by nprobe, m_budget
      order by nprobe, m_budget
    """
  }

  /** c72's at-rest replay of the whole SpanStream batch history: the
    * batch-DEPENDENT combined-occurrence cap is modeled with
    * cumulative per-(key, batch) posting counts (a probe at batch g
    * saw ns = Σ counts of batches < g in the store and nb = its own
    * batch's count — a key can pass early and fail late exactly as
    * the gate's okKeys join decides), pairs orient stored-keeps /
    * arrival-cuts, the diagonal collapse is c56's, and the cut
    * decision is c34's island spelling over the accumulated spans. */
  private def c72Sql(nBatches: Int): String = {
    val w = graft.operators.Dedup.SpanShingleW
    val occ = graft.operators.Dedup.SpanOccCap
    val minSpan = graft.operators.Dedup.SpanMinTokens
    s"""
      with d72 as materialized (
        select doc_id, doc_id % $nBatches as g, string_split(text, ' ') as w0
        from documents),
      sh72 as materialized (
        select doc_id, g, p as pos,
               substr(md5(array_to_string(w0[p+1:p+$w], ' ')), 1, 16) as key
        from d72, lateral (select unnest(range(0, len(w0) - ${w - 1})) as p) t),
      kc72 as materialized (select key, g, count(*) as n from sh72 group by key, g),
      kcum72 as (
        select key, g, n,
               coalesce(sum(n) over (partition by key order by g
                 rows between unbounded preceding and 1 preceding), 0) as ns
        from kc72),
      okk72 as materialized (
        select key, g from kcum72 where ns >= 1 and n + ns <= $occ),
      pr72 as (
        select kb.doc_id as doc_keep, kb.pos as pos_keep,
               dl.doc_id as doc_cut, dl.pos as pos_cut
        from okk72 k
        join sh72 dl on dl.key = k.key and dl.g = k.g
        join sh72 kb on kb.key = k.key and kb.g < k.g
        where kb.doc_id <> dl.doc_id),
      runs72 as (
        select doc_keep, doc_cut, pos_cut - pos_keep as diag, pos_keep, pos_cut,
               pos_cut - row_number() over (
                 partition by doc_keep, doc_cut, pos_cut - pos_keep order by pos_cut) as grp
        from pr72),
      spans72 as (
        select doc_cut, min(pos_cut) as cut_start,
               count(*) + ${w - 1} as n_tokens
        from runs72 group by doc_keep, doc_cut, diag, grp
        having count(*) + ${w - 1} >= $minSpan),
      iv72 as (select doc_cut as doc_id, cut_start as s, cut_start + n_tokens as e
               from spans72),
      m72 as (
        select doc_id, s, e,
               max(e) over (partition by doc_id order by s, e
                 rows between unbounded preceding and 1 preceding) as maxe
        from iv72),
      isl72 as (
        select doc_id, s, e,
               sum(case when maxe is null or s > maxe then 1 else 0 end)
                 over (partition by doc_id order by s, e) as island
        from m72),
      r72 as (select doc_id, island, min(s) as cs, max(e) as ce
              from isl72 group by doc_id, island),
      cut72 as (select doc_id, sum(ce - cs)::bigint as cut_tokens
                from r72 group by doc_id),
      tok72 as (select doc_id, len(string_split(text, ' '))::bigint as n_tokens
                from documents)
      select t.doc_id, t.n_tokens,
             coalesce(c.cut_tokens, 0)::bigint as cut_tokens,
             (t.n_tokens - coalesce(c.cut_tokens, 0))::bigint as eff_tokens
      from tok72 t left join cut72 c using (doc_id)
      order by t.doc_id
    """
  }

  /** c56's incremental-span SQL — also the c68 oracle verbatim: the
    * store-backed run's contract is exactly "equals the at-rest c56
    * rebuild". */
  private val C56_SQL = s"""
      with d56 as (select doc_id, string_split(text, ' ') as w0 from documents),
      bk56 as (select doc_id,
                      ('0x' || substr(md5(doc_id::varchar), 1, 7))::bigint % 100
                        < ${graft.operators.Dedup.DeltaBasePct} as b
               from documents),
      sh56 as (
        select doc_id, p as pos,
               substr(md5(array_to_string(w0[p+1:p+${graft.operators.Dedup.SpanShingleW}], ' ')), 1, 16) as key
        from d56, lateral (select unnest(range(0, len(w0) - ${graft.operators.Dedup.SpanShingleW - 1})) as p) t),
      keyed56 as (
        select key from sh56 group by key
        having count(*) between 2 and ${graft.operators.Dedup.SpanOccCap}),
      pr56 as (
        select kb.doc_id as doc_keep, kb.pos as pos_keep,
               dl.doc_id as doc_cut, dl.pos as pos_cut
        from sh56 kb join keyed56 using (key) join sh56 dl using (key)
        join bk56 b1 on kb.doc_id = b1.doc_id
        join bk56 b2 on dl.doc_id = b2.doc_id
        where b1.b and not b2.b),
      runs56 as (
        select doc_keep, doc_cut, pos_cut - pos_keep as diag, pos_keep, pos_cut,
               pos_cut - row_number() over (
                 partition by doc_keep, doc_cut, pos_cut - pos_keep order by pos_cut) as grp
        from pr56),
      spans56 as (
        select doc_keep, doc_cut, min(pos_keep) as keep_start, min(pos_cut) as cut_start,
               count(*) + ${graft.operators.Dedup.SpanShingleW - 1} as n_tokens
        from runs56 group by doc_keep, doc_cut, diag, grp
        having count(*) + ${graft.operators.Dedup.SpanShingleW - 1} >= ${graft.operators.Dedup.SpanMinTokens})
      select doc_cut, doc_keep, cut_start, keep_start, n_tokens from spans56
      order by doc_cut, doc_keep, cut_start, keep_start
    """

  /** c75's full iterative-BPE oracle: per iteration, pair counts off
    * the CURRENT symbol table (adjacent positions weighted by word
    * frequency), the argmax merge (total desc, a, b — engine-exact
    * integer totals + binary string order), then the SAME greedy
    * application step the c57 chain uses ([[bpeStep]], its learned-
    * merge parameterization). The report is the learned merge list
    * with each pair's total AT SELECTION TIME. */
  private def bpeChainHeader(byteGrain: Boolean, trainPred: String): String = s"""
      tf75 as materialized (
        select doc_id, term, count(*)::bigint as tf
        from (select doc_id, unnest(string_split(text, ' ')) as term from documents)
        group by 1, 2),
      words as materialized (select term, sum(tf)::bigint as n from tf75
        ${if (trainPred.nonEmpty) s"where $trainPred " else ""}group by term),
      s0 as materialized (${if (byteGrain) s"""
        select term, i - 1 as pos, substr(lower(hex(term)), 2*i - 1, 2) as sym
        from (select distinct term from tf75) v,
             lateral (select unnest(range(1, strlen(term) + 1)) as i) t""" else s"""
        select term, i - 1 as pos, substr(term, i::int, 1) as sym
        from (select distinct term from tf75) v,
             lateral (select unnest(range(1, length(term) + 1)) as i) t"""})"""

  private def c75Chain(iters: Int, byteGrain: Boolean = false,
      trainPred: String = ""): String = s"""
      ${bpeChainHeader(byteGrain, trainPred)},
      ${(1 to iters).map { k =>
        s"""cnt$k as materialized (
        select s.sym as a, nx.sym as b, sum(w.n)::bigint as total
        from s${k - 1} s
        join s${k - 1} nx on nx.term = s.term and nx.pos = s.pos + 1
        join words w on w.term = s.term
        group by 1, 2),""" +
        bpeStep(k, s"s${k - 1}", s"s$k",
          mDef = s"select a, b from cnt$k order by total desc, a, b limit 1")
      }.mkString(",")}"""

  private def c75Sql(iters: Int): String = s"""
      with ${c75Chain(iters)},
      rep75 as (${(1 to iters).map(k =>
        s"select $k::int as rank, m.a, m.b, c.total from m$k m join cnt$k c using (a, b)")
        .mkString(" union all ")})
      select rank, a, b, total from rep75 order by rank
    """

  /** The batched-argmax trainer's per-step slot/step layout: step k
    * selects up to min(b, nMerges − (k−1)·b) disjoint pairs. Shared
    * by the chain generator and the report CTEs. */
  private def batchSlots(nMerges: Int, b: Int): Seq[(Int, Int)] = {
    val nSteps = (nMerges + b - 1) / b
    (1 to nSteps).map(k => k -> math.min(b, nMerges - (k - 1) * b))
  }

  /** c171's batched count-select-apply chain (CTE list, no WITH;
    * assumes [[bpeChainHeader]]'s tf75/words/s0 precede it — names
    * are all b-prefixed so it composes beside the exact chain in one
    * query). Per step k: bcnt$k = pair counts off the previous symbol
    * table; bsel${k}_j = the j-th selection slot, unrolled as "the
    * first pair (total desc, a, b) disjoint from every earlier
    * slot's" (exactly the operator's greedy walk — kept pairs gate,
    * skipped pairs don't); bm$k = the step's merge set; then
    * [[bpeStep]]'s greedy collapse with the merge matched by
    * symbol-equality JOIN — each symbol appears in at most one pair
    * of a disjoint set, so the join never duplicates a position, and
    * consecutive-hit runs still only arise within one a==b merge.
    * An empty step (pool exhausted) is a no-op table copy. */
  private def c171Steps(nMerges: Int, b: Int): String =
    batchSlots(nMerges, b).map { case (k, slots) =>
      val sIn = if (k == 1) "s0" else s"bs${k - 1}"
      val sels = (1 to slots).map { j =>
        if (j == 1)
          s"""bsel${k}_1 as (select a, b, total from bcnt$k
        order by total desc, a, b limit 1)"""
        else {
          val prior = (1 until j).map(i => s"select a, b from bsel${k}_$i")
            .mkString(" union all ")
          s"""bsel${k}_$j as (
        select a, b, total from bcnt$k c
        where not exists (select 1 from ($prior) s
                          where s.a in (c.a, c.b) or s.b in (c.a, c.b))
        order by total desc, a, b limit 1)"""
        }
      }.mkString(",")
      s"""bcnt$k as materialized (
        select s.sym as a, nx.sym as b, sum(w.n)::bigint as total
        from $sIn s
        join $sIn nx on nx.term = s.term and nx.pos = s.pos + 1
        join words w on w.term = s.term
        group by 1, 2),
      $sels,
      bm$k as (${(1 to slots).map(j => s"select a, b from bsel${k}_$j")
        .mkString(" union all ")}),
      bx$k as (
        select s.term, s.pos,
               case when m.a is not null then 1 else 0 end as hit
        from $sIn s
        left join $sIn nx on nx.term = s.term and nx.pos = s.pos + 1
        left join bm$k m on s.sym = m.a and nx.sym = m.b),
      bi$k as (select term, pos,
                      pos - row_number() over (partition by term order by pos) as grp
               from bx$k where hit = 1),
      bt$k as materialized (select term, pos from (
                 select term, pos, min(pos) over (partition by term, grp) as g0
                 from bi$k)
               where (pos - g0) % 2 = 0),
      bs$k as materialized (
        select term, row_number() over (partition by term order by pos) - 1 as pos, sym
        from (
          select s.term, s.pos,
                 case when tk.pos is not null then s.sym || nx.sym else s.sym end as sym
          from $sIn s
          left join bt$k tk on tk.term = s.term and tk.pos = s.pos
          left join bt$k tp on tp.term = s.term and tp.pos = s.pos - 1
          left join $sIn nx on nx.term = s.term and nx.pos = s.pos + 1
          where tp.pos is null))"""
    }.mkString(",")

  /** The batched trainer's learned-merge report rows (step, slot, a,
    * b, total) — empty slots contribute nothing, rank is assigned
    * over (step, slot) like the operator's sequential counter. */
  private def c171Rep(nMerges: Int, b: Int): String =
    batchSlots(nMerges, b).flatMap { case (k, slots) =>
      (1 to slots).map(j =>
        s"select $k::int as step, $j::int as slot, a, b, total from bsel${k}_$j")
    }.mkString(" union all ")

  /** c171: the batched-argmax BPE trainer at production shape — byte
    * grain, c163's md5-bucket training sample, BpeBatchB slots per
    * count pass, every count-select-apply step replayed CTE-for-CTE
    * with the B selection slots unrolled. */
  private lazy val C171_SQL: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    val b = graft.operators.TextAnalysis.BpeBatchB
    val pct = graft.operators.TextAnalysis.BpeSampleTrainPct
    val pred = s"('0x' || substr(md5(doc_id::varchar), 1, 7))::bigint % 100 < $pct"
    s"""
      with ${bpeChainHeader(byteGrain = true, trainPred = pred)},
      ${c171Steps(m, b)},
      rep171 as (${c171Rep(m, b)})
      select row_number() over (order by step, slot)::int as rank,
             step, slot, a, b, total
      from rep171 order by rank
    """
  }

  /** c172: both trainers' chains off ONE shared header (same sample
    * predicate), both final symbol tables priced over the FULL
    * corpus, one row per trainer — compression is the audit, not
    * merge parity (batched merge ORDER differs by design). */
  private lazy val C172_SQL: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    val b = graft.operators.TextAnalysis.BpeBatchB
    val pct = graft.operators.TextAnalysis.BpeSampleTrainPct
    val pred = s"('0x' || substr(md5(doc_id::varchar), 1, 7))::bigint % 100 < $pct"
    val lastB = batchSlots(m, b).last._1
    s"""
      with ${c75Chain(m, byteGrain = true, trainPred = pred)},
      ${c171Steps(m, b)},
      nsyx172 as (select term, count(*)::bigint as n from s$m group by term),
      nsyb172 as (select term, count(*)::bigint as n from bs$lastB group by term),
      nmx172 as (select count(*)::bigint as c from (${(1 to m)
        .map(i => s"select a from m$i").mkString(" union all ")})),
      nmb172 as (select count(*)::bigint as c from (${c171Rep(m, b)})),
      enc172 as (
        select sum(tf.tf * strlen(tf.term))::bigint as n_bytes,
               sum(tf.tf * coalesce(x.n, 0))::bigint as u_exact,
               sum(tf.tf * coalesce(bb.n, 0))::bigint as u_batched
        from tf75 tf
        left join nsyx172 x on tf.term = x.term
        left join nsyb172 bb on tf.term = bb.term)
      select * from (
        select 'batched' as trainer, (select c from nmb172) as n_merges,
               u_batched as n_units, n_bytes,
               case when n_bytes > 0
                 then round(u_batched::double / n_bytes, 4) end as compression
        from enc172
        union all
        select 'exact', (select c from nmx172), u_exact, n_bytes,
               case when n_bytes > 0
                 then round(u_exact::double / n_bytes, 4) end
        from enc172)
      order by trainer
    """
  }

  /** c179: the batch-width sweep — one UNROLLED batched chain per B
    * (the generator's CTE names are width-independent, so each width
    * lives in its own nested-WITH derived table; DuckDB scopes CTEs
    * per subquery), each width's final symbol table pricing the full
    * corpus, one row per B. */
  private lazy val C179_SQL: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    val pct = graft.operators.TextAnalysis.BpeSampleTrainPct
    val pred = s"('0x' || substr(md5(doc_id::varchar), 1, 7))::bigint % 100 < $pct"
    val legs = graft.operators.TextAnalysis.BpeSweepBs.map { b =>
      val lastB = batchSlots(m, b).last._1
      s"""select * from (
        with ${bpeChainHeader(byteGrain = true, trainPred = pred)},
        ${c171Steps(m, b)},
        rep179 as (${c171Rep(m, b)}),
        nsy179 as (select term, count(*)::bigint as n from bs$lastB group by term),
        enc179 as (
          select sum(tf.tf * strlen(tf.term))::bigint as n_bytes,
                 sum(tf.tf * coalesce(nsy179.n, 0))::bigint as n_units
          from tf75 tf left join nsy179 on tf.term = nsy179.term)
        select $b::bigint as batch_b,
               (select count(*)::bigint from rep179) as n_merges,
               (select coalesce(max(step), 0)::bigint from rep179) as n_steps,
               n_units, n_bytes,
               case when n_bytes > 0
                 then round(n_units::double / n_bytes, 4) end as compression
        from enc179)"""
    }
    s"""${legs.mkString(" union all ")} order by batch_b"""
  }

  /** c69's winnow-pair chain (CTE list, no WITH) + its report SELECT
    * — split so c74 can consume the report as a candidate CTE. */
  private val C69_CTES = s"""h as (
        select doc_id,
               [substr(md5(w[i]||' '||w[i+1]||' '||w[i+2]),1,8) for i in range(1, len(w)-1)] as hs
        from (select doc_id, string_split(text, ' ') as w from documents)),
      m as (
        select doc_id,
               case when len(hs) >= 4
                 then [list_min(hs[i:i+3]) for i in range(1, len(hs)-2)]
                 else [list_min(hs)] end as mins
        from h),
      fpr as (
        select doc_id, unnest(list_distinct(mins)) as fp from m),
      fprn as (select doc_id, fp from fpr where fp is not null),
      keep69 as (select fp from fprn group by fp
                 having count(*) <= ${graft.operators.Dedup.DfCap}),
      fpk as materialized (select fprn.* from fprn join keep69 using (fp)),
      sz69 as (select doc_id, count(*) as n_fp from fpk group by doc_id),
      inter69 as (
        select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as n_shared
        from fpk a join fpk b on a.fp = b.fp and a.doc_id < b.doc_id
        group by 1, 2)"""

  private val C69_SELECT = s"""select doc_a, doc_b, n_shared,
             round(n_shared::double / least(sa.n_fp, sb.n_fp), 4) as containment,
             round(n_shared::double / (sa.n_fp + sb.n_fp - n_shared), 4) as jaccard
      from inter69
      join sz69 sa on inter69.doc_a = sa.doc_id
      join sz69 sb on inter69.doc_b = sb.doc_id
      where round(n_shared::double / least(sa.n_fp, sb.n_fp), 4)
              >= ${graft.operators.TextAnalysis.WinnowPairBar}
      order by containment desc, doc_a, doc_b limit 50"""

  /** c66's per-cell CTEs: probes at this cell's nprobe, truncated-code
    * ADC (rounded sum over m < budget — the kernel's running-sum
    * round point), top-k rank, per-query hits vs the exact `ex` CTE
    * (0 for queries the cell surfaces nothing for). */
  private def c66Cell(np: Int, mb: Int): String = s"""
      p${np}x$mb as (select vec_id as q_id, c_id as cluster
           from ranked_assign where vec_id < $NQ and rn <= $np),
      s${np}x$mb as (
        select l.q_id, c.vec_id,
               round(sum(l.d2) filter (where c.m < $mb), 4) as adist
        from codes c
        join assigned60 a on a.vec_id = c.vec_id
        join p${np}x$mb p on p.cluster = a.cluster
        join lut l on l.q_id = p.q_id and l.m = c.m and l.k = c.code
        where c.vec_id <> l.q_id
        group by 1, 2),
      k${np}x$mb as (
        select q_id, vec_id from (
          select q_id, vec_id,
                 row_number() over (partition by q_id order by adist, vec_id) as rk
          from s${np}x$mb)
        where rk <= $PTOPK),
      h${np}x$mb as (
        select q6.q_id, count(ex.vec_id)::bigint as n_hits
        from q6
        left join k${np}x$mb a on a.q_id = q6.q_id
        left join ex on ex.q_id = a.q_id and ex.vec_id = a.vec_id
        group by q6.q_id)"""

  private val c66Grid: Seq[(Int, Int)] =
    for {
      np <- graft.operators.Similarity.RecallNprobes
      mb <- graft.operators.Similarity.RecallMBudgets
    } yield (np, mb)
  private def c66Cells: Seq[String] = c66Grid.map { case (np, mb) => c66Cell(np, mb) }
  private def c66CellSelects: Seq[String] = c66Grid.map { case (np, mb) =>
    s"select $np::int as nprobe, $mb::int as m_budget, q_id, n_hits from h${np}x$mb"
  }

  /** One spherical-k-means iteration in DuckDB — the CTE-for-CTE
    * replay of trainCentroidsQuantized's loop body. Exact int64 sums
    * of floor(v·scale + 0.5) make the update order-independent, so
    * the iterative loop is cross-engine deterministic (see the
    * operator's Scaladoc). `prev` is the incoming centroid CTE name,
    * `i` the iteration suffix. Empty clusters keep their previous
    * centroid (coalesce on the left join). */
  private def kmeansIter(prev: String, i: Int, tbl: String = "embeddings"): String = s"""
      asg$i as (
        select e.vec_id, e.embedding, c.c_id,
               row_number() over (partition by e.vec_id
                 order by ${cosN("e.embedding", "c.c_emb")} desc nulls last, c.c_id) as rn
        from $tbl e cross join $prev c),
      a$i as (select vec_id, embedding, c_id from asg$i where rn = 1),
      upd$i as (
        select c_id, i as dim,
               sum(floor(embedding[i]::double * $QS + 0.5)::bigint) as s,
               count(*) as n
        from a$i, unnest(range(1,65)) as t(i)
        group by c_id, i),
      cm$i as (
        select c_id, list(s::double / (n * $QS)::double order by dim) as c_emb
        from upd$i group by c_id),
      cent$i as (
        select c.c_id, coalesce(u.c_emb, c.c_emb) as c_emb
        from $prev c left join cm$i u using (c_id))"""

  /** The full trained-centroid CTE chain: cent0 = the seed (first NC
    * vectors as doubles), then QITERS unrolled iterations — over an
    * arbitrary corpus CTE (c81 trains on the BASE slice only). */
  private def trainedCentroidsOver(tbl: String): String = s"""
      cent0 as (
        select vec_id as c_id,
               list_transform(embedding, x -> x::double) as c_emb
        from $tbl where vec_id < $NC),""" +
    (1 to QITERS).map(i => kmeansIter(s"cent${i - 1}", i, tbl)).mkString(",")

  private val TRAINED_CENTROIDS = trainedCentroidsOver("embeddings")

  /** c18's keep-rate CASE, derived from the operator's rate map. */
  private val KEEP_MILLE = graft.operators.Sampling.DefaultRates
    .map { case (lang, r) => s"when lang = '$lang' then ${(r * 1000).toLong}" }
    .mkString("case ", " ", " else 1000 end")

  // c35 Bloom geometry, c37 BM25 constants, c38 mixture share — all
  // from the operator constants. Double.toString round-trips exactly,
  // so the SQL literal DENOTES the identical IEEE double — but DuckDB
  // parses it as DECIMAL and multiplies bigints EXACTLY in decimal
  // context (e.g. 3 * 2.2 = 6.6 exact, vs double 6.6000000000000005),
  // so any product that is inexact in binary must cast its integer
  // operand ::double first to force the double-by-double path Spark
  // takes (see c37's tf::double). Sums/products that stay exactly
  // representable (±0.5, 0.25·x, 0.75·x, 1000.0·n) are safe either way.
  private val BLOOM_M = graft.operators.TextAnalysis.BloomBits
  private val BLOOM_K = graft.operators.TextAnalysis.BloomHashes
  private val K1 = graft.operators.TextAnalysis.Bm25K1
  private val K1P1 = graft.operators.TextAnalysis.Bm25K1 + 1
  private val B25 = graft.operators.TextAnalysis.Bm25B
  private val OMB = 1 - graft.operators.TextAnalysis.Bm25B
  private val BMTOPK = graft.operators.TextAnalysis.Bm25TopK
  private val QTOK = graft.operators.TextAnalysis.Bm25QueryTokens
  private val PCAP = graft.operators.TextAnalysis.Bm25PostingCap
  private val MIXSHARE = graft.operators.Sampling.MixBudgetShare

  /** c70's full SQL — factored so c78 can run the IDENTICAL report
    * over the derived clustered corpus (table name rewritten below).
    * The seed variant is c66's (NPROBE, full-code) cell machinery,
    * the residual variant the c65 chain; per-query hits vs the exact
    * baseline, missing queries at recall 0. */
  private val C70_SQL = s"""
      with $C47_CELLS,
      $IVF_ASSIGN,
      q6 as (select vec_id as q_id, embedding as q_emb from embeddings where vec_id < $NQ),
      sc6 as (
        select q6.q_id, e.vec_id,
               ${cosN("q6.q_emb", "e.embedding")} as cos
        from embeddings e cross join q6
        where e.vec_id <> q6.q_id),
      ex as (select q_id, vec_id from (
               select q_id, vec_id,
                      row_number() over (partition by q_id order by cos desc nulls last, vec_id) as rk
               from sc6)
             where rk <= $PTOPK),
      ${c66Cell(NPROBE, PM)},
      ${residualServeChain("z", "cc")},
      kz as (select q_id, vec_id from zr where rank <= $PTOPK),
      hz as (
        select q6.q_id, count(ex.vec_id)::bigint as n_hits
        from q6
        left join kz a on a.q_id = q6.q_id
        left join ex on ex.q_id = a.q_id and ex.vec_id = a.vec_id
        group by q6.q_id),
      cells70 as (
        select 'ivfadc' as variant, q_id, n_hits from h${NPROBE}x$PM
        union all
        select 'ivfadc_residual' as variant, q_id, n_hits from hz)
      select variant, count(*) as n_queries,
             round(avg(round(n_hits::double / $PTOPK, 4)), 4) as mean_recall
      from cells70 group by variant order by variant
    """

  /** c78's oracle: the clustered-corpus derivation (the exact twin of
    * Similarity.clusteredCorpus — double math, float round-trip) as a
    * CTE, then c70's ENTIRE report verbatim with every corpus
    * reference rewritten onto it. One spelling of the report; two
    * corpora. */
  /** c71's oracle, factored: the fully trained IVFPQ — c26's
    * fixed-point coarse trainer AND the per-subspace residual trainer
    * replayed CTE-for-CTE in one query, then the per-cluster-LUT
    * serving chain. Shared verbatim by c79 (stored-index serving is
    * defined to reproduce c71's output from persisted artifacts). */
  private val C71_SQL = s"""
      with $TRAINED_CENTROIDS,
      ${residualServeChain("y", s"cent$QITERS")}
      select q_id, rank, vec_id, adist from yr
      where rank <= $PTOPK
      order by q_id, rank
    """

  /** c162: sketch-routes-codes-score serving — stage 1 is c158's
    * sketch top-depth; stage 2 replays the stored index's residual
    * ADC over EXACTLY those candidates (probe set = the clusters the
    * candidates live in, candidate cut = the sketch pairs) — the
    * serve that touches no raw embedding at any stage. */
  private def c162Sql: String = {
    val k = graft.operators.Similarity.JlDim
    val depth = graft.operators.Similarity.RerankDepth
    val cosNK = this.cosNK(k) _
    s"""
      with $TRAINED_CENTROIDS,
      pr162 as materialized (
        select vec_id, ${jlProjList(k)} as p from embeddings),
      q162 as (select vec_id as q_id, p as qp from pr162 where vec_id < $NQ),
      skc as materialized (
        select q.q_id, c.vec_id,
               row_number() over (partition by q.q_id
                 order by ${cosNK("q.qp", "c.p")} desc nulls last, c.vec_id)::bigint
                 as sk_rank
        from pr162 c cross join q162 q
        where c.vec_id <> q.q_id
        qualify sk_rank <= $depth),
      ${residualServeChain("y", s"cent$QITERS",
        probeOverride = Some(
          "select s.q_id, a.cluster from skc s join yasg a on a.vec_id = s.vec_id group by 1, 2"),
        candPred = Some(
          "exists (select 1 from skc x where x.q_id = l.q_id and x.vec_id = c.vec_id)"))}
      select r.q_id, r.rank, r.vec_id, s.sk_rank, r.adist
      from yr r join skc s on s.q_id = r.q_id and s.vec_id = r.vec_id
      where r.rank <= $PTOPK
      order by r.q_id, r.rank
    """
  }

  /** c131's oracle: the stored-index serve (c71's trained chain) with
    * the metadata predicate on the CANDIDATE side — scoring, ranking,
    * and the top-k cut all run on the label-passing population
    * (pre-filtering), exactly where the operator pushes the predicate
    * into the codes scan. */
  private val C131_SQL = s"""
      with $TRAINED_CENTROIDS,
      ${residualServeChain("y", s"cent$QITERS",
        candPred = Some("c.vec_id in (select vec_id from embeddings " +
          s"where label = ${graft.operators.Similarity.FilterLabel})"))}
      select q_id, rank, vec_id, adist from yr
      where rank <= $PTOPK
      order by q_id, rank
    """

  /** c136's oracle: the trained serve chain at FULL probe depth, each
    * candidate tagged with its cluster's probe rank for its query
    * (yra's row_number — the probe ORDER), then every sweep level
    * cuts rank ≤ nprobe and takes its own top-k; recall against c6's
    * exact chain, scan mass analytically from cluster sizes × probed
    * ranks with the query's own vector excluded. */
  private def c136Sql: String = {
    val lvls = graft.operators.Similarity.NprobeLevels.mkString(", ")
    s"""
      with $TRAINED_CENTROIDS,
      ${residualServeChain("y", s"cent$QITERS", nprobe = NC)},
      lv as (select unnest([$lvls])::bigint as nprobe),
      crnk as (
        select s.q_id, s.vec_id, s.adist, r.rn as crank
        from ysc s
        join yasg a on a.vec_id = s.vec_id
        join yra r on r.vec_id = s.q_id and r.c_id = a.cluster),
      swp as (
        select lv.nprobe, c.q_id, c.vec_id,
               row_number() over (partition by lv.nprobe, c.q_id
                 order by c.adist, c.vec_id) as rank
        from lv join crnk c on c.crank <= lv.nprobe),
      tk as (select nprobe, q_id, vec_id from swp where rank <= $PTOPK),
      exq as (select vec_id as q_id, embedding as q_emb
              from embeddings where vec_id < $NQ),
      exs as (
        select q.q_id, e.vec_id,
               ${cosN("q.q_emb", "e.embedding")} as cos
        from embeddings e cross join exq q
        where e.vec_id <> q.q_id),
      ex as (
        select q_id, vec_id from (
          select q_id, vec_id,
                 row_number() over (partition by q_id
                   order by cos desc nulls last, vec_id) as rank
          from exs)
        where rank <= $PTOPK),
      ph as (
        select tk.nprobe, tk.q_id, count(ex.vec_id)::bigint as n_hits
        from tk left join ex on ex.q_id = tk.q_id and ex.vec_id = tk.vec_id
        group by 1, 2),
      qg as (select lv.nprobe, e.vec_id as q_id
             from lv cross join embeddings e where e.vec_id < $NQ),
      pq as (
        select qg.nprobe, qg.q_id, coalesce(ph.n_hits, 0) as n_hits
        from qg left join ph using (nprobe, q_id)),
      rec as (
        select nprobe, count(*)::bigint as n_queries,
               round(avg(n_hits::double / $PTOPK), 4) as mean_recall
        from pq group by 1),
      csz as (select cluster, count(*)::bigint as sz from yasg group by 1),
      scan as (
        select lv.nprobe,
               (sum(csz.sz) - (select count(*) from embeddings
                               where vec_id < $NQ))::bigint as n_scanned
        from lv
        join yra r on r.vec_id < $NQ and r.rn <= lv.nprobe
        join csz on csz.cluster = r.c_id
        group by lv.nprobe)
      select rec.nprobe, rec.n_queries, scan.n_scanned, rec.mean_recall
      from rec join scan using (nprobe)
      order by nprobe
    """
  }

  /** c145's oracle: the deterministic ±1 projection replayed as a
    * nested list comprehension (sign = md5 parity of "jl:i:j"),
    * 64-dim and [[graft.operators.Similarity.JlDim]]-dim cosines
    * through the tier's one null-on-degenerate rounding. */
  /** k-dim twin of [[cosN]] (same null-on-degenerate + Rz rounding)
    * over the first `k` list positions — c145/c147's sketch cosine. */
  private def cosNK(k: Int)(a: String, b: String): String = {
    def dotK(x: String, y: String) =
      s"list_sum(list_transform(range(1,${k + 1}), i -> $x[i]::double * $y[i]::double))"
    val cosK = s"${dotK(a, b)} / (sqrt(${dotK(a, a)}) * sqrt(${dotK(b, b)}))"
    s"(case when isnan(round($cosK, 4)) then null else ${Rz(cosK, 4)} end)"
  }

  /** c145's deterministic ±1 projection as a list comprehension over
    * the `embedding` column (sign = md5 parity of "jl:i:j") — shared
    * by the audit (c145) and the corpus-wide serving column (c147). */
  private def jlProjList(k: Int): String = s"""
               [list_sum(list_transform(range(1, 65),
                  i -> case when ('0x' || substr(md5('jl:' || i::varchar || ':' || j::varchar), 1, 1))::bigint % 2 = 0
                            then embedding[i]::double
                            else -(embedding[i]::double) end))
                for j in range(0, $k)]"""

  private def c145Sql: String = {
    val k = graft.operators.Similarity.JlDim
    val cosNK = this.cosNK(k) _
    s"""
      with pr145 as (
        select vec_id, embedding as v, ${jlProjList(k)} as p
        from embeddings where vec_id < $NQ)
      select a.vec_id as vec_a, b.vec_id as vec_b,
             ${cosN("a.v", "b.v")} as cos_full,
             ${cosNK("a.p", "b.p")} as cos_proj,
             round(abs(${cosN("a.v", "b.v")} - ${cosNK("a.p", "b.p")}), 4) as abs_err
      from pr145 a join pr145 b on a.vec_id < b.vec_id
      order by vec_a, vec_b
    """
  }

  /** c147: the projected-column serving — the corpus-wide JL sketch
    * (c145's matrix), c5's capped sign-LSH banding over the sketch's
    * first 8 dims, the audit grid's max |err| as the threshold band,
    * two-tier decisions (sketch-definite `proj`, band-escalated
    * `full`). */
  private def c147Sql: String = {
    val k = graft.operators.Similarity.JlDim
    val th = graft.operators.Similarity.SemDedupThreshold
    val cosNK = this.cosNK(k) _
    s"""
      with pr147 as (
        select vec_id, embedding as v, ${jlProjList(k)} as p
        from embeddings),
      a147 as (select vec_id, v, p from pr147 where vec_id < $NQ),
      err147 as (
        select round(abs(${cosN("a.v", "b.v")}
                 - ${cosNK("a.p", "b.p")}), 4) as abs_err
        from a147 a join a147 b on a.vec_id < b.vec_id
        where ${cosN("a.v", "b.v")} is not null
          and ${cosNK("a.p", "b.p")} is not null),
      bd147 as (
        select abs_err as band from (
          select abs_err, row_number() over (order by abs_err) as rk,
                 count(*) over () as n
          from err147)
        where rk = ((n * ${graft.operators.Similarity.JlBandPct} + 99) // 100)),
      v147 as (
        select vec_id, p,
          (case when p[1] >= 0 then 1 else 0 end)
        + (case when p[2] >= 0 then 2 else 0 end)
        + (case when p[3] >= 0 then 4 else 0 end)
        + (case when p[4] >= 0 then 8 else 0 end)
        + (case when p[5] >= 0 then 16 else 0 end)
        + (case when p[6] >= 0 then 32 else 0 end)
        + (case when p[7] >= 0 then 64 else 0 end)
        + (case when p[8] >= 0 then 128 else 0 end) as bucket
        from pr147
        qualify count(*) over (partition by bucket) <= $CAP),
      sc147 as (
        select a.vec_id as vec_a, b.vec_id as vec_b,
               ${cosNK("a.p", "b.p")} as cos_proj
        from v147 a join v147 b
          on a.bucket = b.bucket and a.vec_id < b.vec_id
        cross join bd147
        where ${cosNK("a.p", "b.p")} >= $th - band),
      esc147 as (
        select s.vec_a, s.vec_b, s.cos_proj,
               ${cosN("ea.embedding", "eb.embedding")} as cos_full
        from sc147 s
        cross join bd147
        join embeddings ea on ea.vec_id = s.vec_a
        join embeddings eb on eb.vec_id = s.vec_b
        where s.cos_proj < $th + band)
      select vec_a, vec_b, cos_proj, null::double as cos_full, 'proj' as tier
      from sc147 cross join bd147 where cos_proj >= $th + band
      union all
      select vec_a, vec_b, cos_proj, cos_full, 'full' as tier
      from esc147 where cos_full >= $th
      order by vec_a, vec_b
    """
  }

  /** c144's oracle: the trained coarse assignment (c79's) feeding
    * c38's temperature-admission CTEs verbatim, keyed by cluster. */
  private def c144Sql: String = s"""
      with $TRAINED_CENTROIDS,
      ra144 as (
        select e.vec_id, c.c_id,
               row_number() over (partition by e.vec_id
                 order by ${cosN("e.embedding", "c.c_emb")} desc nulls last, c.c_id) as rn
        from embeddings e cross join cent$QITERS c),
      asg144 as (select vec_id as doc_id, c_id as cluster from ra144 where rn = 1),
      counts144 as (select cluster, count(*) as n_total from asg144 group by 1),
      tot144 as (
        select sum(n_total)::bigint as n_corpus,
               round(sum(sqrt(n_total)), 6) as z
        from counts144),
      rates144 as (
        select cluster,
               least(1000, floor(1000.0 * floor(n_corpus * $MIXSHARE)
                 * sqrt(n_total) / (z * n_total))::bigint) as mille
        from counts144, tot144),
      d144 as (
        select doc_id, cluster,
               ('0x' || substr(md5(doc_id::varchar), 1, 7))::bigint % 1000 as bucket
        from asg144)
      select d144.cluster, count(*) as n_docs, min(mille) as keep_mille,
             (count(*) filter (where bucket < mille))::bigint as n_kept,
             round((count(*) filter (where bucket < mille))::double / count(*), 4) as kept_frac
      from d144 join rates144 using (cluster)
      group by d144.cluster order by d144.cluster
    """

  /** c81's oracle: the base-vs-delta asymmetry replayed in one query
    * — trainers over the base slice, everything else over the whole
    * corpus (the boundary predicate is the operator constant). */
  private val BASE_VEC_PRED =
    s"not (vec_id % 5 = 0 and vec_id >= ${graft.operators.Similarity.IndexBaseBoundary})"

  private val C81_SQL = s"""
      with bemb as (select * from embeddings where $BASE_VEC_PRED),
      ${trainedCentroidsOver("bemb")},
      ${residualServeChain("y", s"cent$QITERS", trainFilter = Some(BASE_VEC_PRED))}
      select q_id, rank, vec_id, adist from yr
      where rank <= $PTOPK
      order by q_id, rank
    """

  /** c82's oracle: the churn asymmetry in one query — coarse +
    * residual trainers over the PRE-churn corpus (the index's
    * training vintage; `trainCorpus = embeddings`), while
    * assignment, encode, queries, and serving read the CHURNED
    * derivation (`uemb`: deletes + exact in-place updates). The
    * touched-only maintenance the Scala side performs must equal this
    * full logical re-encode because the encode kernel is per-vector
    * pure — the hash check IS that proof. */
  private val C82_SQL = s"""
      with uemb as (
        select vec_id,
               case when vec_id % 7 = 3
                    then list_transform(embedding, x -> (x::double * 0.5 + 0.25)::real)
                    else embedding end as embedding,
               label
        from embeddings
        where vec_id % 11 <> 4),
      $TRAINED_CENTROIDS,
      ${residualServeChain("y", s"cent$QITERS", corpus = "uemb",
        trainCorpus = Some("embeddings"))}
      select q_id, rank, vec_id, adist from yr
      where rank <= $PTOPK
      order by q_id, rank
    """

  // c87: the churned index's health report — c82's replay chain (the
  // index's pre-churn training vintage, the churned corpus served),
  // then per-vector reconstruction error = the encode's own chosen
  // cell distances (yvd at ycodes' argmin), accumulated in exact e4
  // integer units per cluster
  /** The churned-index health chain (uemb → g87, CTE list without the
    * WITH keyword) — shared by the c87 report and c122's repair,
    * which consumes g87's degraded flags. */
  private val C87_CHAIN = s"""uemb as (
        select vec_id,
               case when vec_id % 7 = 3
                    then list_transform(embedding, x -> (x::double * 0.5 + 0.25)::real)
                    else embedding end as embedding,
               label
        from embeddings
        where vec_id % 11 <> 4),
      $TRAINED_CENTROIDS,
      ${residualServeChain("y", s"cent$QITERS", corpus = "uemb",
        trainCorpus = Some("embeddings"))},
      qe87 as (
        select v.vec_id, sum(round(v.d2 * 10000)::bigint) as qerr_e4
        from yvd v join ycodes c on c.vec_id = v.vec_id and c.m = v.m and c.code = v.k
        group by v.vec_id),
      h87 as (
        select a.cluster, q.vec_id, q.qerr_e4, (q.vec_id % 7 = 3) as upd
        from qe87 q join yasg a using (vec_id)),
      g87 as (
        select cluster,
               count(*)::bigint as n_vecs,
               (count(*) filter (where upd))::bigint as n_updated,
               round(sum(qerr_e4) / (10000.0 * count(*)), 4) as mean_qerr,
               case when count(*) filter (where upd) > 0
                 then round((sum(qerr_e4) filter (where upd))
                            / (10000.0 * count(*) filter (where upd)), 4)
               end as upd_mean_qerr
        from h87 group by cluster)"""

  private val C87_SQL = s"""
      with $C87_CHAIN
      select cluster, n_vecs, n_updated, mean_qerr, upd_mean_qerr,
             coalesce(upd_mean_qerr > mean_qerr, false) as degraded
      from g87 order by cluster
    """

  /** c133's oracle: c87's chain (per-vector errors h87, cluster means
    * g87) read at the QUERY slice — each query's own reconstruction
    * error over its cluster's corpus mean, ratio and flag at the
    * operator's interpolated bar. */
  private val C133_SQL = s"""
      with $C87_CHAIN,
      q133 as (
        select vec_id as q_id, cluster,
               round(qerr_e4 / 10000.0, 4) as q_qerr
        from h87 where vec_id < $NQ)
      select q.q_id, q.cluster, q.q_qerr, g.mean_qerr,
             round(q.q_qerr / g.mean_qerr, 4) as ood_ratio,
             (round(q.q_qerr / g.mean_qerr, 4)
               > ${graft.operators.Similarity.OodRatioBar}) as ood
      from q133 q join g87 g using (cluster)
      order by q.q_id
    """

  /** One iteration of c122's CLUSTER-KEYED subquantizer trainer —
    * [[pqTrainIter]] with the cluster key threaded through the
    * assignment join, the update aggregate, and the keep-previous
    * coalesce. */
  private def c122TrainIter(prev: String, i: Int): String = s"""
      rd$i as (
        select v.cluster, v.vec_id, v.m, cb.k, v.sub,
               round(list_sum([(sub[j]-csub[j])*(sub[j]-csub[j])
                 for j in range(1,${PSUB + 1})]), 4) as d2
        from rvm v join $prev cb on cb.cluster = v.cluster and cb.m = v.m),
      ra$i as (
        select cluster, m, k as code, sub from rd$i
        qualify row_number() over (partition by vec_id, m order by d2, k) = 1),
      ru$i as (
        select cluster, m, code, j as dim,
               sum(floor(sub[j] * $QS + 0.5)::bigint) as s, count(*) as n
        from ra$i, unnest(range(1,${PSUB + 1})) as t(j)
        group by cluster, m, code, j),
      rm$i as (
        select cluster, m, code as k,
               list(s::double / (n * $QS)::double order by dim) as csub
        from ru$i group by cluster, m, code),
      rcb$i as (
        select c.cluster, c.m, c.k, coalesce(u.csub, c.csub) as csub
        from $prev c left join rm$i u
          on u.cluster = c.cluster and u.m = c.m and u.k = c.k)"""

  /** c122's repair chain (dcl → rqd, CTE list without WITH): degraded
    * seedable clusters, their members' residual slices (codes_v2
    * assignment, v1 centroids — the coarse geometry is not
    * retrained), the keyed trainer unrolled, and every re-encode cell
    * distance under the local books. Shared by the c122 report and
    * c123's repaired-index serving. */
  private def c122Chain: String = s"""
      dcl as (select cluster from g87
              where coalesce(upd_mean_qerr > mean_qerr, false) and n_vecs >= $PQK),
      rvm as (
        select a.cluster, v.vec_id, v.m, v.sub
        from yvm v join yasg a using (vec_id) join dcl on dcl.cluster = a.cluster),
      rcb0 as (
        select cluster, m, (rk - 1)::bigint as k, sub as csub
        from (select cluster, m, vec_id, sub,
                     row_number() over (partition by cluster, m order by vec_id) as rk
              from rvm)
        where rk <= $PQK),
      ${(1 to QITERS).map(i => c122TrainIter(s"rcb${i - 1}", i)).mkString(",")},
      rqd as (
        select v.cluster, v.vec_id, v.m, cb.k,
               round(list_sum([(sub[j]-csub[j])*(sub[j]-csub[j])
                 for j in range(1,${PSUB + 1})]), 4) as d2
        from rvm v join rcb$QITERS cb on cb.cluster = v.cluster and cb.m = v.m)"""

  /** c122: c87's health chain, then the repair — the keyed trainer,
    * the re-encode argmin, and the per-cluster after-error. */
  private def c122Sql: String = s"""
      with $C87_CHAIN,
      $c122Chain,
      rch as (
        select cluster, vec_id, m, d2 from rqd
        qualify row_number() over (partition by vec_id, m order by d2, k) = 1),
      gafter as (
        select cluster,
               round(sum(round(d2 * 10000)::bigint)
                     / (10000.0 * count(distinct vec_id)), 4) as mean_after
        from rch group by cluster)
      select g.cluster, g.n_vecs,
             coalesce(g.upd_mean_qerr > g.mean_qerr, false) as degraded,
             (d.cluster is not null) as retrained,
             g.mean_qerr as mean_qerr_before,
             coalesce(a.mean_after, g.mean_qerr) as mean_qerr_after
      from g87 g
      left join dcl d on d.cluster = g.cluster
      left join gafter a on a.cluster = g.cluster
      order by g.cluster
    """

  /** c123: the repaired index SERVED — c122's chain, then serving
    * with local-over-global book selection: per probed (query,
    * cluster) the LUT builds from the coalesced book, candidates are
    * the v3 code union (untouched clusters' v2 codes + the repaired
    * re-encode), ADC + rank as every stored-serving oracle. */
  private def c123Sql: String = s"""
      with $C87_CHAIN,
      $c122Chain,
      rcode as (
        select cluster, vec_id, m, k from rqd
        qualify row_number() over (partition by vec_id, m order by d2, k) = 1),
      bks123 as (
        select cl.cluster, g.m, g.k, coalesce(r.csub, g.csub) as csub
        from (select distinct cluster from yasg) cl
        cross join ytcb$QITERS g
        left join rcb$QITERS r on r.cluster = cl.cluster and r.m = g.m and r.k = g.k),
      lut123 as (
        select q.q_id, q.cluster, q.m, b.k,
               round(list_sum([(sub[j]-csub[j])*(sub[j]-csub[j])
                 for j in range(1,${PSUB + 1})]), 4) as d2
        from yqrm q join bks123 b on b.cluster = q.cluster and b.m = q.m),
      codes123 as (
        select a.cluster, c.vec_id, c.m, c.code
        from ycodes c join yasg a using (vec_id)
        left join dcl d on d.cluster = a.cluster
        where d.cluster is null
        union all
        select cluster, vec_id, m, k as code from rcode),
      sc123 as (
        select l.q_id, c.vec_id, round(sum(l.d2), 4) as adist
        from codes123 c
        join lut123 l on l.cluster = c.cluster and l.m = c.m and l.k = c.code
        where c.vec_id <> l.q_id
        group by 1, 2),
      r123 as (select q_id, vec_id, adist,
               row_number() over (partition by q_id order by adist, vec_id)::bigint as rank
               from sc123)
      select q_id, rank, vec_id, adist from r123
      where rank <= $PTOPK
      order by q_id, rank
    """

  /** The clustered-derivation CTE (the exact twin of
    * Similarity.clusteredCorpus — double math, float round-trip),
    * shared by the c78 and c80 oracles: one spelling of the
    * derivation, two reports rewritten onto it. */
  private val CLUSTERED_CTE = """
      embc as (
        select vec_id,
               list_transform(range(1, 65), i ->
                 ((case when (i - 1) // 8 = vec_id % 8 then 4.0::double else 0.0::double end)
                  + embedding[i]::double * 0.25)::real) as embedding,
               label
        from embeddings)"""

  private def onClustered(sql: String): String = {
    val body = sql.trim.stripPrefix("with")
    s"""
      with $CLUSTERED_CTE,
      ${body.replaceAll("\\bembeddings\\b", "embc")}
    """
  }

  private val C78_SQL = onClustered(C70_SQL)

  /** c80's oracle: c73's ENTIRE trained-grid replay (both trainers
    * CTE-for-CTE) with every corpus reference rewritten onto the
    * clustered derivation — c78's factoring applied to the trained
    * tier. */
  private def c80Sql: String = onClustered(c73Sql)

  /** c88's training replay: the shared CTE chain — c48's feature
    * extraction + c41's battery as the teacher label, then every
    * score-gradient-update step unrolled CTE-for-CTE (the c26/c64/c75
    * trainer-replay discipline). Per step i: p{i} scores every doc
    * under the e6-integer weights w{i} (4dp-rounded probability),
    * a{i} reduces the six exact-integer gradient sums + the
    * teacher-agreement count, w{i+1} applies the half-away rounded
    * lr·mean update in bigint units. */
  private def c88Chain(steps: Int, sfx: String = "", kw: String = "with",
      trainWhere: String = ""): String = {
    import graft.operators.TextAnalysis._
    val trainPred = if (trainWhere.isEmpty) "" else s" where $trainWhere"
    val sb = new StringBuilder
    sb ++= s"""
      $kw tf$sfx as materialized (
        select doc_id, term, count(*)::bigint as tf
        from (select doc_id, unnest(string_split(text, ' ')) as term from documents)
        group by 1, 2),
      sig$sfx as materialized (
        select doc_id,
               sum(tf)::bigint as n_words,
               round(sum(tf * length(term))::double / sum(tf), 4) as mean_word_len,
               round(sum(case when regexp_matches(term, '^[a-z]+$$') then tf else 0 end)::double
                     / sum(tf), 4) as alpha_frac,
               round(sum(case when list_contains($markers, term) then tf else 0 end)::double
                     / sum(tf), 4) as stop_frac,
               round(count(*)::double / sum(tf), 4) as distinct_ratio,
               round(sum(tf * ((length(term) - length(replace(term, '#', '')))
                               + (length(term) - length(replace(term, '...', ''))) // 3))::double
                     / sum(tf), 4) as symbol_ratio,
               sum(case when list_contains($markers, term) then tf else 0 end)::bigint as stop_hits
        from tf$sfx group by doc_id),
      t$sfx as materialized (
        select doc_id,
               round(log10(n_words::double), 4) as x0,
               mean_word_len as x1, alpha_frac as x2,
               stop_frac as x3, distinct_ratio as x4,
               (case when n_words >= $GopherMinWords and n_words <= $GopherMaxWords
                      and mean_word_len >= $GopherMinMeanLen
                      and mean_word_len <= $GopherMaxMeanLen
                      and alpha_frac >= $GopherMinAlphaFrac
                      and symbol_ratio <= $GopherMaxSymbolRatio
                      and stop_hits >= $GopherMinStopHits
                 then 1 else 0 end)::double as y
        from sig$sfx),
      w0$sfx as materialized (select 0::bigint as w0, 0::bigint as w1, 0::bigint as w2,
                    0::bigint as w3, 0::bigint as w4, 0::bigint as w5)"""
    for (i <- 0 to steps) {
      sb ++= s""",
      p$i$sfx as materialized (
        select t.*,
               round(1.0 / (1.0 + exp(-((w.w0 / 1000000.0) * x0 + (w.w1 / 1000000.0) * x1
                 + (w.w2 / 1000000.0) * x2 + (w.w3 / 1000000.0) * x3
                 + (w.w4 / 1000000.0) * x4 + (w.w5 / 1000000.0)))), 4) as p
        from t$sfx t cross join w$i$sfx w),
      a$i$sfx as materialized (
        select sum(cast(round((p - y) * x0 * 1000000.0, 0) as bigint))::bigint as g0,
               sum(cast(round((p - y) * x1 * 1000000.0, 0) as bigint))::bigint as g1,
               sum(cast(round((p - y) * x2 * 1000000.0, 0) as bigint))::bigint as g2,
               sum(cast(round((p - y) * x3 * 1000000.0, 0) as bigint))::bigint as g3,
               sum(cast(round((p - y) * x4 * 1000000.0, 0) as bigint))::bigint as g4,
               sum(cast(round((p - y) * 1.0 * 1000000.0, 0) as bigint))::bigint as g5,
               sum(case when (p >= 0.5) = (y = 1.0) then 1 else 0 end)::bigint as ok,
               count(*)::bigint as n
        from p$i$sfx$trainPred)"""
      if (i < steps) sb ++= s""",
      w${i + 1}$sfx as materialized (
        select w.w0 - cast(round($QcTrainLr * (a.g0 / (a.n)::double), 0) as bigint) as w0,
               w.w1 - cast(round($QcTrainLr * (a.g1 / (a.n)::double), 0) as bigint) as w1,
               w.w2 - cast(round($QcTrainLr * (a.g2 / (a.n)::double), 0) as bigint) as w2,
               w.w3 - cast(round($QcTrainLr * (a.g3 / (a.n)::double), 0) as bigint) as w3,
               w.w4 - cast(round($QcTrainLr * (a.g4 / (a.n)::double), 0) as bigint) as w4,
               w.w5 - cast(round($QcTrainLr * (a.g5 / (a.n)::double), 0) as bigint) as w5
        from w$i$sfx w cross join a$i$sfx a)"""
    }
    sb.toString
  }

  /** c88: the trajectory — per step, weights (6dp read-back of the
    * e6 integers) + teacher-agreement count. */
  private def c88Sql: String = {
    val steps = graft.operators.TextAnalysis.QcTrainSteps
    val rows = (0 to steps).map { i =>
      s"""select $i::bigint as step, w.w0, w.w1, w.w2, w.w3, w.w4, w.w5,
                 a.ok as n_correct
          from w$i w cross join a$i a"""
    }.mkString("\n          union all\n          ")
    s"""${c88Chain(steps)}
      select step,
             round(w0 / 1000000.0, 6) as w_log_words,
             round(w1 / 1000000.0, 6) as w_mean_len,
             round(w2 / 1000000.0, 6) as w_alpha,
             round(w3 / 1000000.0, 6) as w_stop,
             round(w4 / 1000000.0, 6) as w_distinct,
             round(w5 / 1000000.0, 6) as bias,
             n_correct
      from ($rows)
      order by step
    """
  }

  /** c89: serve under the FINAL trained weights — same chain, scored
    * once, with the per-doc teacher-agreement audit. */
  private def c89Sql: String = {
    val steps = graft.operators.TextAnalysis.QcTrainSteps
    s"""${c88Chain(steps)}
      select doc_id, score,
             (case when score >= 0.5 then 1 else 0 end)::bigint as keep,
             teacher_keep,
             (case when (case when score >= 0.5 then 1 else 0 end) = teacher_keep
               then 1 else 0 end)::bigint as agree
      from (
        select t.doc_id,
               round(1.0 / (1.0 + exp(-((w.w0 / 1000000.0) * x0 + (w.w1 / 1000000.0) * x1
                 + (w.w2 / 1000000.0) * x2 + (w.w3 / 1000000.0) * x3
                 + (w.w4 / 1000000.0) * x4 + (w.w5 / 1000000.0)))), 4) as score,
               y::bigint as teacher_keep
        from t cross join w$steps w)
      order by doc_id
    """
  }

  /** c90: the teacher funnel (c50's dec chain, CTEs suffixed 90) and
    * the student funnel (same corpus-grain stages, quality leg = the
    * c88 chain's final-weight score) joined at doc grain into the
    * transition matrix. */
  private def c90Sql: String = {
    import graft.operators.TextAnalysis._
    val steps = QcTrainSteps
    s"""${c88Chain(steps)},
      scored90 as (
        select t.doc_id,
               round(1.0 / (1.0 + exp(-((w.w0 / 1000000.0) * x0 + (w.w1 / 1000000.0) * x1
                 + (w.w2 / 1000000.0) * x2 + (w.w3 / 1000000.0) * x3
                 + (w.w4 / 1000000.0) * x4 + (w.w5 / 1000000.0)))), 4) as score
        from t cross join w$steps w),
      pop90 as (select * from documents where doc_id % 97 <> 0),
      kd90 as (select md5(text) as h, min(doc_id) as keep_doc from pop90 group by 1),
      sh90 as ($SH8),
      bench90 as (select distinct sh8 from sh90 where doc_id % 97 = 0),
      ct90 as (
        select sh90.doc_id, round(count(bench90.sh8)::double / count(*), 4) as contam
        from sh90 left join bench90 on sh90.sh8 = bench90.sh8
        where sh90.doc_id % 97 <> 0
        group by sh90.doc_id),
      sig90 as (
        select doc_id,
               len(w) as n_tokens,
               round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) as en_score,
               round(((length(text) - length(replace(text, 'th', ''))) / 2
                    + (length(text) - length(replace(text, 'he', ''))) / 2
                    + (length(text) - length(replace(text, 'in', ''))) / 2
                    + (length(text) - length(replace(text, 'er', ''))) / 2
                     )::double / length(text), 4) as en_ngram_score,
               round(len(list_distinct(w))::double / len(w), 4) as distinct_ratio,
               len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+'))
                 + len(regexp_extract_all(text, '[0-9]+')) as n_pii
        from (select doc_id, text, string_split(text, ' ') as w from pop90)),
      dec90 as (
        select p.doc_id,
               case when p.doc_id <> kd90.keep_doc then 'duplicate'
                    when coalesce(ct90.contam, 0) >= $FunnelContamBar then 'contaminated'
                    when n_tokens < 5 then 'too_short'
                    when not (en_score > 0.01 or en_ngram_score > 0.02) then 'non_en'
                    when distinct_ratio < 0.3 then 'repetitive'
                    when n_pii > 20 then 'pii_heavy'
                    else 'keep' end as teacher_stage,
               case when p.doc_id <> kd90.keep_doc then 'duplicate'
                    when coalesce(ct90.contam, 0) >= $FunnelContamBar then 'contaminated'
                    when sc.score < $QcThreshold then 'low_quality'
                    else 'keep' end as student_stage
        from pop90 p
        join kd90 on md5(p.text) = kd90.h
        left join ct90 on ct90.doc_id = p.doc_id
        join sig90 on sig90.doc_id = p.doc_id
        join scored90 sc on sc.doc_id = p.doc_id),
      tot90 as (select count(*) as total from pop90)
      select (case teacher_stage when 'duplicate' then 1 when 'contaminated' then 2
                when 'too_short' then 3 when 'non_en' then 4 when 'repetitive' then 5
                when 'pii_heavy' then 6 else 7 end)::bigint as t_order,
             teacher_stage,
             (case student_stage when 'duplicate' then 1 when 'contaminated' then 2
                when 'low_quality' then 3 else 7 end)::bigint as s_order,
             student_stage, count(*) as n_docs,
             round(count(*)::double / tot90.total, 4) as share
      from dec90, tot90 group by teacher_stage, student_stage, tot90.total
      order by t_order, teacher_stage, s_order
    """
  }

  /** c91: PSI per classifier feature, train-vintage vs incoming, over
    * fixed-width bins (ranges interpolated from the operator). */
  private def c91Sql: String = {
    import graft.operators.TextAnalysis._
    def bin(x: String, lo: Double, hi: Double): String =
      s"least(greatest(floor(($x - $lo) / ${hi - lo} * $DriftBins), 0), ${DriftBins - 1})::bigint"
    val legs = DriftRanges.zip(Seq("x0", "x1", "x2", "x3", "x4")).map {
      case ((fname, lo, hi), x) =>
        s"select slice, '$fname' as feature, ${bin(x, lo, hi)} as bin from t91"
    }.mkString("\n          union all ")
    s"""
      with tf91 as materialized (
        select doc_id, term, count(*)::bigint as tf
        from (select doc_id, unnest(string_split(text, ' ')) as term from documents)
        group by 1, 2),
      sig91 as (
        select doc_id,
               sum(tf)::bigint as n_words,
               round(sum(tf * length(term))::double / sum(tf), 4) as mean_word_len,
               round(sum(case when regexp_matches(term, '^[a-z]+$$') then tf else 0 end)::double
                     / sum(tf), 4) as alpha_frac,
               round(sum(case when list_contains($markers, term) then tf else 0 end)::double
                     / sum(tf), 4) as stop_frac,
               round(count(*)::double / sum(tf), 4) as distinct_ratio
        from tf91 group by doc_id),
      t91 as materialized (
        select round(log10(n_words::double), 4) as x0,
               mean_word_len as x1, alpha_frac as x2,
               stop_frac as x3, distinct_ratio as x4,
               case when ('0x' || substr(md5(doc_id::varchar), 1, 7))::bigint % 100
                      < ${graft.operators.Sampling.SplitTrainPct}
                 then 'train' else 'incoming' end as slice
        from sig91),
      fb91 as ($legs),
      cnt91 as (select feature, bin, slice, count(*)::bigint as n
                from fb91 group by feature, bin, slice),
      tot91 as (select slice, count(*)::bigint as tot from t91 group by slice),
      grid91 as (select f.feature, r.bin::bigint as bin
                 from (select distinct feature from cnt91) f,
                      range(0, $DriftBins) r(bin)),
      props91 as (
        select g.feature, g.bin,
               round(coalesce(ctr.n, 0)::double / ttr.tot, 4) as p_tr,
               round(coalesce(cin.n, 0)::double / tin.tot, 4) as p_in,
               ttr.tot as tot_tr, tin.tot as tot_in
        from grid91 g
        left join (select feature, bin, n from cnt91 where slice = 'train') ctr
          using (feature, bin)
        left join (select feature, bin, n from cnt91 where slice = 'incoming') cin
          using (feature, bin)
        cross join (select tot from tot91 where slice = 'train') ttr
        cross join (select tot from tot91 where slice = 'incoming') tin),
      gaps91 as (
        select *, row_number() over (partition by feature
                    order by abs(p_in - p_tr) desc, bin) as gr
        from props91)
      select feature, max(tot_tr)::bigint as n_train, max(tot_in)::bigint as n_incoming,
             ${Rz(s"sum((p_in - p_tr) * ln((p_in + $DriftEps) / (p_tr + $DriftEps)))", 4)} as psi,
             max(case when gr = 1 then bin end)::bigint as max_gap_bin,
             max(case when gr = 1 then ${Rz("p_in - p_tr", 4)} end) as max_gap
      from gaps91 group by feature order by feature
    """
  }

  /** c92: the iterative-BPE chain with TRAINING restricted to the c13
    * train buckets (words92 = train-slice weights; the symbol tables
    * cover the WHOLE vocabulary so the learned merges apply to
    * holdout terms too — exactly [[graft.operators.TextAnalysis]]'s
    * split-trained c75 + whole-corpus encodeUnderMerges), reduced to
    * the per-split generalization report. */
  private def c92Sql: String = {
    val iters = graft.operators.TextAnalysis.BpeMerges
    val chain = (1 to iters).map { k =>
      s"""cnt92_$k as materialized (
        select s.sym as a, nx.sym as b, sum(w.n)::bigint as total
        from s92_${k - 1} s
        join s92_${k - 1} nx on nx.term = s.term and nx.pos = s.pos + 1
        join words92 w on w.term = s.term
        group by 1, 2),""" +
      bpeStep(k, s"s92_${k - 1}", s"s92_$k",
        mDef = s"select a, b from cnt92_$k order by total desc, a, b limit 1")
    }.mkString(",")
    s"""
      with tf92 as materialized (
        select doc_id, term, count(*)::bigint as tf
        from (select doc_id, unnest(string_split(text, ' ')) as term from documents)
        group by 1, 2),
      lab92 as (
        select doc_id,
               case when ('0x' || substr(md5(doc_id::varchar), 1, 7))::bigint % 100
                      < ${graft.operators.Sampling.SplitTrainPct}
                 then 'train' else 'holdout' end as split
        from documents),
      words92 as materialized (
        select term, sum(tf)::bigint as n
        from tf92 join lab92 using (doc_id)
        where split = 'train' group by term),
      s92_0 as materialized (
        select term, i - 1 as pos, substr(term, i::int, 1) as sym
        from (select distinct term from tf92) v,
             lateral (select unnest(range(1, length(term) + 1)) as i) t),
      $chain,
      ns92 as (select term, count(*)::bigint as n_syms from s92_$iters group by term),
      pd92 as (
        select tf92.doc_id,
               sum(tf)::bigint as n_words,
               sum(tf * length(term))::bigint as n_chars,
               sum(tf * n_syms)::bigint as n_bpe
        from tf92 join ns92 using (term) group by tf92.doc_id),
      agg92 as (
        select split, count(*)::bigint as n_docs,
               sum(n_words)::bigint as n_words,
               sum(n_bpe)::bigint as n_bpe_tokens,
               round(sum(n_bpe)::double / sum(n_words), 4) as tokens_per_word,
               round(sum(n_bpe)::double / sum(n_chars), 4) as compression
        from pd92 join lab92 using (doc_id) group by split),
      oov92 as (
        select split,
               count(distinct case when w.term is null then tf92.term end)::bigint as n_oov_terms,
               round(sum(case when w.term is null then tf else 0 end)::double
                     / sum(tf), 4) as oov_token_share
        from tf92 join lab92 using (doc_id)
        left join (select term from words92) w on tf92.term = w.term
        group by split)
      select split, n_docs, n_words, n_bpe_tokens, tokens_per_word, compression,
             n_oov_terms, oov_token_share
      from agg92 join oov92 using (split)
      order by split
    """
  }

  /** c93: uncertainty top-K off the trained chain's final weights. */
  private def c93Sql: String = {
    import graft.operators.TextAnalysis._
    val steps = QcTrainSteps
    s"""${c88Chain(steps)},
      scored93 as (
        select t.doc_id,
               round(1.0 / (1.0 + exp(-((w.w0 / 1000000.0) * x0 + (w.w1 / 1000000.0) * x1
                 + (w.w2 / 1000000.0) * x2 + (w.w3 / 1000000.0) * x3
                 + (w.w4 / 1000000.0) * x4 + (w.w5 / 1000000.0)))), 4) as score,
               y::bigint as teacher_keep
        from t cross join w$steps w)
      select row_number() over (order by round(abs(score - $QcThreshold), 4), doc_id) as rank,
             doc_id, score,
             round(abs(score - $QcThreshold), 4) as margin,
             teacher_keep
      from scored93
      order by margin, doc_id
      limit $ActiveBatchK
    """
  }

  /** c94: c86's chain at doc grain — the packing assignment projected
    * to boundary metadata (start offset within the sequence budget,
    * straddle flag). */
  private def c94Sql: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    s"""
      with ${c75Chain(m)},
      nsy94 as (select term, count(*)::bigint as n_syms from s$m group by term),
      enc94 as (
        select tf.doc_id,
               sum(tf.tf * coalesce(nsy94.n_syms, 0))::bigint as n_tok
        from tf75 tf left join nsy94 on tf.term = nsy94.term
        group by tf.doc_id),
      d94 as (select doc_id, doc_id % $SHARDS as shard, n_tok from enc94),
      a94 as (
        select doc_id, shard, n_tok,
               sum(n_tok) over (partition by shard order by doc_id
                 rows between unbounded preceding and current row)::bigint as cum
        from d94)
      select shard, ((cum - n_tok) // $BUDGET)::bigint as seq_id, doc_id,
             (cum - n_tok - ((cum - n_tok) // $BUDGET) * $BUDGET)::bigint as start_offset,
             n_tok,
             (cum - n_tok - ((cum - n_tok) // $BUDGET) * $BUDGET + n_tok > $BUDGET)
               as crosses_budget
      from a94 order by doc_id
    """
  }

  /** c95: c12's recursive component chain + the trained chain's
    * final-weight scores, arbitrated per cluster (score desc, doc_id)
    * — suffix `q` on the classifier chain keeps its CTE names clear
    * of C3_CHAIN's `sig`. */
  private def c95Sql: String = {
    import graft.operators.TextAnalysis._
    val steps = QcTrainSteps
    s"""${c88Chain(steps, "q", "with recursive")},
      scored95 as (
        select t.doc_id,
               round(1.0 / (1.0 + exp(-((w.w0 / 1000000.0) * x0 + (w.w1 / 1000000.0) * x1
                 + (w.w2 / 1000000.0) * x2 + (w.w3 / 1000000.0) * x3
                 + (w.w4 / 1000000.0) * x4 + (w.w5 / 1000000.0)))), 4) as score
        from tq t cross join w${steps}q w),
      $C3_CHAIN,
      vp95 as (select doc_a, doc_b from vpairs where jaccard >= 0.5),
      edges95 as (
        select doc_a as a, doc_b as b from vp95
        union
        select doc_b as a, doc_a as b from vp95),
      reach95(a, b) as (
        select a, b from edges95
        union
        select r.a, e.b from reach95 r join edges95 e on r.b = e.a where e.b <> r.a),
      lab95 as (select a as doc_id, least(a, min(b)) as cluster from reach95 group by a),
      mem95 as (
        select lab95.doc_id, lab95.cluster, s.score
        from lab95 join scored95 s on lab95.doc_id = s.doc_id),
      rk95 as (
        select *, row_number() over (partition by cluster
                    order by score desc, doc_id) as rn
        from mem95)
      select cluster, count(*)::bigint as n_members,
             max(case when rn = 1 then doc_id end)::bigint as keeper_doc,
             max(case when rn = 1 then score end) as keeper_score,
             max(case when doc_id = cluster then score end) as minid_score,
             (max(case when rn = 1 then doc_id end) <> cluster) as changed,
             round(max(case when rn = 1 then score end)
                   - max(case when doc_id = cluster then score end), 4) as quality_gain
      from rk95 group by cluster order by cluster
    """
  }

  /** c96: c67's funnel replay with stage 1 decided by the c88 chain's
    * final weights (`low_quality` below threshold) — the suffixed
    * classifier chain scores every doc, the student `q` definition
    * swaps into the shared stateless block, and the novelty batches
    * unroll over the student-gated survivor population. */
  private def c96Sql: String = {
    import graft.operators.TextAnalysis._
    val steps = QcTrainSteps
    val n = graft.streaming.FunnelStream.AuditBatches
    val studentQ = s"""
        select sig.doc_id,
               case when sc.score < $QcThreshold then 'low_quality'
                    else 'keep' end as qreason
        from sig join scored96 sc using (doc_id)"""
    s"""
      with recursive ${c88Chain(steps, "q", "")},
      scored96 as materialized (
        select t.doc_id,
               round(1.0 / (1.0 + exp(-((w.w0 / 1000000.0) * x0 + (w.w1 / 1000000.0) * x1
                 + (w.w2 / 1000000.0) * x2 + (w.w3 / 1000000.0) * x3
                 + (w.w4 / 1000000.0) * x4 + (w.w5 / 1000000.0)))), 4) as score
        from tq t cross join w${steps}q w),
      ${c67Chain(n, Some(studentQ))}
      select doc_id, stage, dup_of from alldec order by doc_id
    """
  }

  /** c97: two training chains — vintage (gradient sums filtered to
    * the c13 train buckets; the symbol of the what-if) and full — both
    * scoring every doc, joined in one projection with the flip
    * verdict. */
  private def c97Sql: String = {
    import graft.operators.TextAnalysis._
    val steps = QcTrainSteps
    val vintage = s"('0x' || substr(md5(doc_id::varchar), 1, 7))::bigint % 100" +
      s" < ${graft.operators.Sampling.SplitTrainPct}"
    s"""${c88Chain(steps, "v", "with", vintage)},
      ${c88Chain(steps, "f", "")},
      core97 as (
        select t.doc_id,
               round(1.0 / (1.0 + exp(-((wv.w0 / 1000000.0) * x0 + (wv.w1 / 1000000.0) * x1
                 + (wv.w2 / 1000000.0) * x2 + (wv.w3 / 1000000.0) * x3
                 + (wv.w4 / 1000000.0) * x4 + (wv.w5 / 1000000.0)))), 4) as score_vintage,
               round(1.0 / (1.0 + exp(-((wf.w0 / 1000000.0) * x0 + (wf.w1 / 1000000.0) * x1
                 + (wf.w2 / 1000000.0) * x2 + (wf.w3 / 1000000.0) * x3
                 + (wf.w4 / 1000000.0) * x4 + (wf.w5 / 1000000.0)))), 4) as score_full
        from tv t
        cross join w${steps}v wv
        cross join w${steps}f wf)
      select doc_id, score_vintage, score_full,
             (case when score_vintage >= $QcThreshold then 1 else 0 end)::bigint as keep_vintage,
             (case when score_full >= $QcThreshold then 1 else 0 end)::bigint as keep_full,
             case when score_vintage < $QcThreshold and score_full >= $QcThreshold then 'gained'
                  when score_vintage >= $QcThreshold and score_full < $QcThreshold then 'lost'
                  else null end as flip
      from core97 order by doc_id
    """
  }

  /** c98: the manifest compose — the c75 training chain's BPE counts,
    * c50's funnel keeps, c13's split buckets, the (split, shard)
    * packing window, and the ordered-doc_id checksum per shard. */
  private def c98Sql: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    val train = graft.operators.Sampling.SplitTrainPct
    val valp = graft.operators.Sampling.SplitValPct
    s"""
      with ${c75Chain(m)},
      nsy98 as (select term, count(*)::bigint as n_syms from s$m group by term),
      enc98 as (
        select tf.doc_id,
               sum(tf.tf * coalesce(nsy98.n_syms, 0))::bigint as n_tok
        from tf75 tf left join nsy98 on tf.term = nsy98.term
        group by tf.doc_id),
      pop98 as (select * from documents where doc_id % 97 <> 0),
      kd98 as (select md5(text) as h, min(doc_id) as keep_doc from pop98 group by 1),
      sh98 as ($SH8),
      bench98 as (select distinct sh8 from sh98 where doc_id % 97 = 0),
      ct98 as (
        select sh98.doc_id, round(count(bench98.sh8)::double / count(*), 4) as contam
        from sh98 left join bench98 on sh98.sh8 = bench98.sh8
        where sh98.doc_id % 97 <> 0
        group by sh98.doc_id),
      sig98 as (
        select doc_id,
               len(w) as n_tokens,
               round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) as en_score,
               round(((length(text) - length(replace(text, 'th', ''))) / 2
                    + (length(text) - length(replace(text, 'he', ''))) / 2
                    + (length(text) - length(replace(text, 'in', ''))) / 2
                    + (length(text) - length(replace(text, 'er', ''))) / 2
                     )::double / length(text), 4) as en_ngram_score,
               round(len(list_distinct(w))::double / len(w), 4) as distinct_ratio,
               len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+'))
                 + len(regexp_extract_all(text, '[0-9]+')) as n_pii
        from (select doc_id, text, string_split(text, ' ') as w from pop98)),
      keeps98 as (
        select p.doc_id
        from pop98 p
        join kd98 on md5(p.text) = kd98.h
        left join ct98 on ct98.doc_id = p.doc_id
        join sig98 on sig98.doc_id = p.doc_id
        where p.doc_id = kd98.keep_doc
          and coalesce(ct98.contam, 0) < ${graft.operators.TextAnalysis.FunnelContamBar}
          and n_tokens >= 5
          and (en_score > 0.01 or en_ngram_score > 0.02)
          and distinct_ratio >= 0.3
          and n_pii <= 20),
      cnt98 as (
        select e.doc_id, e.n_tok,
               case when ('0x' || substr(md5(e.doc_id::varchar), 1, 7))::bigint % 100 < $train
                      then 'train'
                    when ('0x' || substr(md5(e.doc_id::varchar), 1, 7))::bigint % 100 < $valp
                      then 'val'
                    else 'test' end as split,
               e.doc_id % $SHARDS as shard
        from enc98 e join keeps98 using (doc_id)),
      asg98 as (
        select *, sum(n_tok) over (partition by split, shard order by doc_id
                 rows between unbounded preceding and current row)::bigint as cum
        from cnt98)
      select split, shard, count(*)::bigint as n_docs,
             count(distinct ((cum - n_tok) // ${graft.operators.Sampling.DefaultTokenBudget}))::bigint as n_seqs,
             sum(n_tok)::bigint as n_tokens,
             bit_xor(('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint) as doc_checksum
      from asg98 group by split, shard order by split, shard
    """
  }

  /** c99: c29's doc-grain ntile + c28's seeded shuffle key/shard, the
    * per-shard easy-first window. */
  private def c99Sql: String = s"""
      with q99 as (
        select source, doc_id,
               round(0.3 * least(len(w)::double / 100.0, 1.0)
                   + 0.4 * round(len(list_distinct(w))::double / len(w), 4)
                   + 0.3 * least(round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) * 5.0, 1.0), 5) as quality
        from (select source, doc_id, string_split(text, ' ') as w from documents)),
      b99 as (
        select source, doc_id,
               ntile(${graft.operators.TextAnalysis.QualityBins})
                 over (partition by source order by quality, doc_id)::bigint as bin
        from q99),
      k99 as (
        select doc_id, source, bin,
               md5('${graft.operators.Sampling.ShuffleSeed}' || ':' || doc_id::varchar) as shuffle_key
        from b99),
      s99 as (
        select *, ('0x' || substr(shuffle_key, 1, 7))::bigint
                    % ${graft.operators.Sampling.ShuffleShards} as shard
        from k99)
      select doc_id, source, bin, shard,
             row_number() over (partition by shard
               order by bin desc, shuffle_key)::bigint as pos
      from s99
      order by shard, pos
    """

  /** c100: c35's Bloom spelling per benchmark family over one shared
    * shingle pass; population = docs in neither slice. */
  /** c100's oracle is GENERATED from the same [[graft.operators
    * .TextAnalysis.BenchRegistry]] the operator iterates — a new
    * suite is one registry row; neither spelling is edited. */
  private def c100Sql: String = {
    val suites = graft.operators.TextAnalysis.BenchRegistry
    val maxFrac = graft.streaming.DecontamStream.MaxFlaggedFrac
    def ffBlock(tag: String, benchPred: String): String = s"""
      bench$tag as (select distinct sh8 from shs100 where $benchPred),
      bits$tag as (
        select distinct ('0x' || substr(md5(sh8), 1 + 7*i, 7))::bigint % $BLOOM_M as pos
        from bench$tag, unnest(range(0,$BLOOM_K)) as t(i)),
      per$tag as (
        select p.doc_id, p.s, count(*) as n_pos, count(b.pos) as n_hit
        from probe100 p left join bits$tag b on p.pos = b.pos
        group by p.doc_id, p.s),
      ff$tag as (
        select doc_id, count(*) as n_sh,
               round((count(*) filter (where n_hit = n_pos))::double / count(*), 4) as ff
        from per$tag group by doc_id)"""
    val popPred = suites.map(s => s"not (${s.pred})").mkString(" and ")
    val ffBlocks = suites.map(s => ffBlock(s.id, s.pred)).mkString(",\n")
    val ffCols = suites
      .map(s => s"ff${s.id}.ff as ff_bench_${s.id}").mkString(", ")
    val maxExpr = s"greatest(${suites.map(s => s"ff${s.id}.ff").mkString(", ")})"
    val hitsExpr = suites
      .map(s => s"(case when ff${s.id}.ff > $maxFrac then 1 else 0 end)")
      .mkString(" + ")
    val joins = suites.tail
      .map(s => s"join ff${s.id} using (doc_id)").mkString(" ")
    val head = s"ff${suites.head.id}"
    s"""
      with shs100 as materialized (
        select doc_id, s, substr(md5(s), 1, 8) as sh8
        from (select distinct doc_id, s from ($SHINGLES))),
      probe100 as materialized (
        select doc_id, s,
               ('0x' || substr(md5(sh8), 1 + 7*i, 7))::bigint % $BLOOM_M as pos
        from shs100, unnest(range(0,$BLOOM_K)) as t(i)
        where $popPred),
      $ffBlocks
      select $head.doc_id, $head.n_sh,
             $ffCols,
             $maxExpr as max_ff,
             ($hitsExpr)::bigint as n_benchmarks_hit,
             ($maxExpr > $maxFrac) as contaminated
      from $head $joins
      order by $head.doc_id
    """
  }

  /** c101: two vintage-scoped keep chains (dedup contest and
    * benchmark shingles are each vintage's own; per-doc signals and
    * the shipped tokenizer's counts are vintage-independent, computed
    * once) full-outer joined at doc grain, per-(split, shard) diff. */
  private def c101Sql: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    val train = graft.operators.Sampling.SplitTrainPct
    val valp = graft.operators.Sampling.SplitValPct
    val basePred = s"('0x' || substr(md5(doc_id::varchar), 1, 7))::bigint % 100" +
      s" < ${graft.operators.Dedup.DeltaBasePct}"
    def vintage(t: String, pred: String): String = s"""
      pop$t as (select * from documents where $pred and doc_id % 97 <> 0),
      kd$t as (select md5(text) as h, min(doc_id) as keep_doc from pop$t group by 1),
      bench$t as (select distinct sh8 from shA
                  where ($pred) and doc_id % 97 = 0),
      ct$t as (
        select shA.doc_id, round(count(bench$t.sh8)::double / count(*), 4) as contam
        from shA left join bench$t on shA.sh8 = bench$t.sh8
        where ($pred) and shA.doc_id % 97 <> 0
        group by shA.doc_id),
      keeps$t as (
        select p.doc_id
        from pop$t p
        join kd$t on md5(p.text) = kd$t.h
        left join ct$t on ct$t.doc_id = p.doc_id
        join sig101 on sig101.doc_id = p.doc_id
        where p.doc_id = kd$t.keep_doc
          and coalesce(ct$t.contam, 0) < ${graft.operators.TextAnalysis.FunnelContamBar}
          and n_tokens >= 5
          and (en_score > 0.01 or en_ngram_score > 0.02)
          and distinct_ratio >= 0.3
          and n_pii <= 20),
      asg$t as (
        select e.doc_id, e.n_tok,
               case when ('0x' || substr(md5(e.doc_id::varchar), 1, 7))::bigint % 100 < $train
                      then 'train'
                    when ('0x' || substr(md5(e.doc_id::varchar), 1, 7))::bigint % 100 < $valp
                      then 'val'
                    else 'test' end as split,
               e.doc_id % $SHARDS as shard
        from enc101 e join keeps$t using (doc_id))"""
    s"""
      with ${c75Chain(m)},
      nsy101 as (select term, count(*)::bigint as n_syms from s$m group by term),
      enc101 as (
        select tf.doc_id,
               sum(tf.tf * coalesce(nsy101.n_syms, 0))::bigint as n_tok
        from tf75 tf left join nsy101 on tf.term = nsy101.term
        group by tf.doc_id),
      shA as materialized ($SH8),
      sig101 as materialized (
        select doc_id,
               len(w) as n_tokens,
               round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) as en_score,
               round(((length(text) - length(replace(text, 'th', ''))) / 2
                    + (length(text) - length(replace(text, 'he', ''))) / 2
                    + (length(text) - length(replace(text, 'in', ''))) / 2
                    + (length(text) - length(replace(text, 'er', ''))) / 2
                     )::double / length(text), 4) as en_ngram_score,
               round(len(list_distinct(w))::double / len(w), 4) as distinct_ratio,
               len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+'))
                 + len(regexp_extract_all(text, '[0-9]+')) as n_pii
        from (select doc_id, text, string_split(text, ' ') as w from documents)),
      ${vintage("v1", basePred)},
      ${vintage("v2", "1 = 1")}
      select coalesce(a.split, b.split) as split,
             coalesce(a.shard, b.shard) as shard,
             sum(case when a.doc_id is not null then 1 else 0 end)::bigint as n_v1,
             sum(case when b.doc_id is not null then 1 else 0 end)::bigint as n_v2,
             sum(case when a.doc_id is null and b.doc_id is not null then 1 else 0 end)::bigint as n_added,
             sum(case when a.doc_id is not null and b.doc_id is null then 1 else 0 end)::bigint as n_dropped,
             (sum(coalesce(b.n_tok, 0)) - sum(coalesce(a.n_tok, 0)))::bigint as tok_delta,
             (sum(case when a.doc_id is null and b.doc_id is not null then 1 else 0 end)
              + sum(case when a.doc_id is not null and b.doc_id is null then 1 else 0 end)) > 0 as changed
      from asgv1 a full outer join asgv2 b
        on a.doc_id = b.doc_id and a.split = b.split and a.shard = b.shard
      group by 1, 2
      order by split, shard
    """
  }

  /** c102: the trained chain scored once, unnested over the threshold
    * grid, per-threshold confusion counts + PR. */
  private def c102Sql: String = {
    import graft.operators.TextAnalysis._
    val steps = QcTrainSteps
    val grid = SweepThresholds.mkString("[", ", ", "]")
    s"""${c88Chain(steps)},
      scored102 as (
        select t.doc_id,
               round(1.0 / (1.0 + exp(-((w.w0 / 1000000.0) * x0 + (w.w1 / 1000000.0) * x1
                 + (w.w2 / 1000000.0) * x2 + (w.w3 / 1000000.0) * x3
                 + (w.w4 / 1000000.0) * x4 + (w.w5 / 1000000.0)))), 4) as score,
               y::bigint as teacher_keep
        from t cross join w$steps w),
      sweep102 as (
        select score, teacher_keep, unnest($grid) as threshold
        from scored102),
      agg102 as (
        select threshold,
               sum(case when score >= threshold then 1 else 0 end)::bigint as n_keep,
               sum(case when score >= threshold and teacher_keep = 1 then 1 else 0 end)::bigint as tp,
               sum(case when score >= threshold and teacher_keep = 0 then 1 else 0 end)::bigint as fp,
               sum(case when score < threshold and teacher_keep = 1 then 1 else 0 end)::bigint as fn,
               round(sum(case when (case when score >= threshold then 1 else 0 end) = teacher_keep
                 then 1 else 0 end)::double / count(*), 4) as agreement
        from sweep102 group by threshold)
      select threshold, n_keep, tp, fp, fn,
             case when tp + fp > 0 then round(tp::double / (tp + fp), 4) end as precision,
             case when tp + fn > 0 then round(tp::double / (tp + fn), 4) end as recall,
             agreement
      from agg102 order by threshold
    """
  }

  /** c103/c104's shared chain: c99's schedule CTEs joined to c94's
    * stored-tokenizer counts, the pack prefix sum running over
    * (shard, pos) — schedule order — instead of doc_id. */
  private def c103Chain: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    s"""
      ${c75Chain(m)},
      nsy103 as (select term, count(*)::bigint as n_syms from s$m group by term),
      enc103 as (
        select tf.doc_id,
               sum(tf.tf * coalesce(nsy103.n_syms, 0))::bigint as n_tok
        from tf75 tf left join nsy103 on tf.term = nsy103.term
        group by tf.doc_id),
      q103 as (
        select source, doc_id,
               round(0.3 * least(len(w)::double / 100.0, 1.0)
                   + 0.4 * round(len(list_distinct(w))::double / len(w), 4)
                   + 0.3 * least(round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) * 5.0, 1.0), 5) as quality
        from (select source, doc_id, string_split(text, ' ') as w from documents)),
      b103 as (
        select source, doc_id,
               ntile(${graft.operators.TextAnalysis.QualityBins})
                 over (partition by source order by quality, doc_id)::bigint as bin
        from q103),
      k103 as (
        select doc_id, bin,
               md5('${graft.operators.Sampling.ShuffleSeed}' || ':' || doc_id::varchar) as shuffle_key
        from b103),
      s103 as (
        select *, ('0x' || substr(shuffle_key, 1, 7))::bigint
                    % ${graft.operators.Sampling.ShuffleShards} as shard
        from k103),
      sched103 as (
        select doc_id, bin, shard,
               row_number() over (partition by shard
                 order by bin desc, shuffle_key)::bigint as pos
        from s103),
      a103 as (
        select sched103.doc_id, bin, shard, pos, enc103.n_tok,
               sum(n_tok) over (partition by shard order by pos
                 rows between unbounded preceding and current row)::bigint as cum
        from sched103 join enc103 on sched103.doc_id = enc103.doc_id)"""
  }

  private def c103Sql: String = s"""
      with $c103Chain
      select doc_id, bin, shard, pos, ((cum - n_tok) // $BUDGET)::bigint as seq_id,
             (cum - n_tok - ((cum - n_tok) // $BUDGET) * $BUDGET)::bigint as start_offset,
             n_tok
      from a103 order by shard, pos
    """

  /** c104: the per-(shard, seq) aggregate over c103's assignment. */
  private def c104Sql: String = s"""
      with $c103Chain,
      asg104 as (
        select doc_id, bin, shard, pos, n_tok,
               ((cum - n_tok) // $BUDGET)::bigint as seq_id
        from a103)
      select shard, seq_id, count(*)::bigint as n_docs,
             sum(n_tok)::bigint as sum_tok,
             min(pos)::bigint as first_pos, max(pos)::bigint as last_pos,
             max(bin)::bigint as max_bin, min(bin)::bigint as min_bin,
             round(sum(n_tok)::double / $BUDGET, 4) as fill_frac
      from asg104 group by shard, seq_id order by shard, seq_id
    """

  /** c105: the c98 keep chain (one funnel spelling) feeding c99's
    * schedule chain — quality re-binned WITHIN the kept population.
    * Factored as a CTE list (ending in `sched105`) so c111 can run
    * the packing window over the same schedule. */
  /** The funnel's keep chain (pop<sfx> → kept<sfx>, CTE list without
    * WITH) — ONE spelling of c50's keeps shared by c105's schedule
    * and c124's yield report. `sfx` names the CTE family and `corpus`
    * the table/CTE the vintage reads — the parameterized spelling of
    * the vintage rewrite (r12 advice: no post-hoc replaceAll on the
    * rendered SQL, which silently breaks on an unlucky substring). */
  private def keepsChain(sfx: String = "105", corpus: String = "documents"): String = s"""
      pop$sfx as (select * from $corpus where doc_id % 97 <> 0),
      kd$sfx as (select md5(text) as h, min(doc_id) as keep_doc from pop$sfx group by 1),
      sh$sfx as (${sh8Over(corpus)}),
      bench$sfx as (select distinct sh8 from sh$sfx where doc_id % 97 = 0),
      ct$sfx as (
        select sh$sfx.doc_id, round(count(bench$sfx.sh8)::double / count(*), 4) as contam
        from sh$sfx left join bench$sfx on sh$sfx.sh8 = bench$sfx.sh8
        where sh$sfx.doc_id % 97 <> 0
        group by sh$sfx.doc_id),
      sig$sfx as (
        select doc_id,
               len(w) as n_tokens,
               round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) as en_score,
               round(((length(text) - length(replace(text, 'th', ''))) / 2
                    + (length(text) - length(replace(text, 'he', ''))) / 2
                    + (length(text) - length(replace(text, 'in', ''))) / 2
                    + (length(text) - length(replace(text, 'er', ''))) / 2
                     )::double / length(text), 4) as en_ngram_score,
               round(len(list_distinct(w))::double / len(w), 4) as distinct_ratio,
               len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+'))
                 + len(regexp_extract_all(text, '[0-9]+')) as n_pii
        from (select doc_id, text, string_split(text, ' ') as w from pop$sfx)),
      keeps$sfx as (
        select p.doc_id
        from pop$sfx p
        join kd$sfx on md5(p.text) = kd$sfx.h
        left join ct$sfx on ct$sfx.doc_id = p.doc_id
        join sig$sfx on sig$sfx.doc_id = p.doc_id
        where p.doc_id = kd$sfx.keep_doc
          and coalesce(ct$sfx.contam, 0) < ${graft.operators.TextAnalysis.FunnelContamBar}
          and n_tokens >= 5
          and (en_score > 0.01 or en_ngram_score > 0.02)
          and distinct_ratio >= 0.3
          and n_pii <= 20),
      kept$sfx as (select d.* from $corpus d join keeps$sfx using (doc_id))"""

  /** c105: [[keepsChain]] feeding c99's schedule chain — quality
    * re-binned WITHIN the kept population. Ends in `sched105` so c111
    * can run the packing window over the same schedule. */
  private def c105Chain(sfx: String = "105", corpus: String = "documents"): String = s"""
      ${keepsChain(sfx, corpus)},
      q$sfx as (
        select source, doc_id,
               round(0.3 * least(len(w)::double / 100.0, 1.0)
                   + 0.4 * round(len(list_distinct(w))::double / len(w), 4)
                   + 0.3 * least(round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) * 5.0, 1.0), 5) as quality
        from (select source, doc_id, string_split(text, ' ') as w from kept$sfx)),
      b$sfx as (
        select source, doc_id,
               ntile(${graft.operators.TextAnalysis.QualityBins})
                 over (partition by source order by quality, doc_id)::bigint as bin
        from q$sfx),
      k$sfx as (
        select doc_id, source, bin,
               md5('${graft.operators.Sampling.ShuffleSeed}' || ':' || doc_id::varchar) as shuffle_key
        from b$sfx),
      s$sfx as (
        select *, ('0x' || substr(shuffle_key, 1, 7))::bigint
                    % ${graft.operators.Sampling.ShuffleShards} as shard
        from k$sfx),
      sched$sfx as (
        select doc_id, source, bin, shard,
               row_number() over (partition by shard
                 order by bin desc, shuffle_key)::bigint as pos
        from s$sfx)"""

  private def c105Sql: String = s"""
      with ${c105Chain()}
      select doc_id, source, bin, shard, pos from sched105
      order by shard, pos
    """

  /** c127: the sequence-grain vintage diff — ONE shared tokenizer
    * chain (the shipped artifact's stance), the keeps-schedule +
    * packing chain once over the full corpus (c105's CTEs verbatim)
    * and once PARAMETERIZED onto the base vintage (c105Chain("127",
    * "dv1") — the onClustered discipline), two
    * sequence aggregates with c98's bit_xor membership checksum, one
    * full-outer status join. */
  private def c127Sql: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    val basePred =
      s"('0x' || substr(md5(doc_id::varchar), 1, 7))::bigint % 100 < ${graft.operators.Dedup.DeltaBasePct}"
    val v1Chain = c105Chain("127", "dv1")
    s"""
      with ${c75Chain(m)},
      nsyx as (select term, count(*)::bigint as n_syms from s$m group by term),
      encx as (
        select tf.doc_id, sum(tf.tf * coalesce(nsyx.n_syms, 0))::bigint as n_tok
        from tf75 tf left join nsyx on tf.term = nsyx.term
        group by tf.doc_id),
      ${c105Chain()},
      dv1 as (select * from documents where $basePred),
      $v1Chain,
      a2x as (
        select sched105.doc_id, shard, pos, encx.n_tok,
               sum(n_tok) over (partition by shard order by pos
                 rows between unbounded preceding and current row)::bigint as cum
        from sched105 join encx on sched105.doc_id = encx.doc_id),
      p2x as (select doc_id, shard, ((cum - n_tok) // $BUDGET)::bigint as seq_id, n_tok
              from a2x),
      a1x as (
        select sched127.doc_id, shard, pos, encx.n_tok,
               sum(n_tok) over (partition by shard order by pos
                 rows between unbounded preceding and current row)::bigint as cum
        from sched127 join encx on sched127.doc_id = encx.doc_id),
      p1x as (select doc_id, shard, ((cum - n_tok) // $BUDGET)::bigint as seq_id, n_tok
              from a1x),
      s1x as (
        select shard, seq_id, count(*)::bigint as n_docs_v1,
               sum(n_tok)::bigint as tok_v1,
               bit_xor(('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint) as checksum_v1
        from p1x group by 1, 2),
      s2x as (
        select shard, seq_id, count(*)::bigint as n_docs_v2,
               sum(n_tok)::bigint as tok_v2,
               bit_xor(('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint) as checksum_v2
        from p2x group by 1, 2)
      select shard, seq_id,
             coalesce(n_docs_v1, 0)::bigint as n_docs_v1,
             coalesce(tok_v1, 0)::bigint as tok_v1,
             coalesce(n_docs_v2, 0)::bigint as n_docs_v2,
             coalesce(tok_v2, 0)::bigint as tok_v2,
             case when checksum_v1 is null then 'added'
                  when checksum_v2 is null then 'removed'
                  when checksum_v1 = checksum_v2 and n_docs_v1 = n_docs_v2
                       and tok_v1 = tok_v2 then 'same'
                  else 'changed' end as status
      from s1x full outer join s2x using (shard, seq_id)
      order by shard, seq_id
    """
  }

  /** c129: the pinned-bin schedule — the v1 keeps chain (keepsChain
    * parameterized onto the base vintage), the free ntile ONCE over
    * v1's kept population to derive the explicit cuts, the v2 keeps
    * binned by cut comparison (first bin whose cut ≥ quality, top-bin
    * clamp), then c99's shard/shuffle-key/pos spelling. */
  private def c129Sql: String = {
    val bins = graft.operators.TextAnalysis.QualityBins
    val basePred =
      s"('0x' || substr(md5(doc_id::varchar), 1, 7))::bigint % 100 < ${graft.operators.Dedup.DeltaBasePct}"
    val v1Chain = keepsChain("129", "dv129")
    def qOf(tbl: String, cte: String) = s"""
      $cte as (
        select source, doc_id,
               round(0.3 * least(len(w)::double / 100.0, 1.0)
                   + 0.4 * round(len(list_distinct(w))::double / len(w), 4)
                   + 0.3 * least(round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) * 5.0, 1.0), 5) as quality
        from (select source, doc_id, string_split(text, ' ') as w from $tbl))"""
    s"""
      with dv129 as (select * from documents where $basePred),
      $v1Chain,
      ${keepsChain()},
      ${qOf("kept129", "qv1")},
      bv1 as (
        select source, doc_id, quality,
               ntile($bins) over (partition by source
                 order by quality, doc_id)::bigint as bin
        from qv1),
      cuts129 as (select source, bin, max(quality) as cut from bv1 group by 1, 2),
      ${qOf("kept105", "qv2")},
      binp as (
        select q.doc_id, q.source,
               coalesce(min(c.bin) filter (where c.cut >= q.quality), $bins)::bigint as bin
        from qv2 q left join cuts129 c on c.source = q.source
        group by q.doc_id, q.source, q.quality),
      k129 as (
        select doc_id, source, bin,
               md5('${graft.operators.Sampling.ShuffleSeed}' || ':' || doc_id::varchar) as shuffle_key
        from binp),
      s129 as (
        select *, ('0x' || substr(shuffle_key, 1, 7))::bigint
                    % ${graft.operators.Sampling.ShuffleShards} as shard
        from k129)
      select doc_id, source, bin, shard,
             row_number() over (partition by shard
               order by bin desc, shuffle_key)::bigint as pos
      from s129
      order by shard, pos
    """
  }

  /** c128: the quota gate's at-rest replay — c112's weight CTEs
    * (st/tot/mille verbatim), quota = (budget · mille) div 1000, one
    * per-source prefix sum over (batch, doc_id) arrival order. */
  private def c128Sql: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    val n = graft.streaming.FunnelStream.AuditBatches
    val budget = graft.streaming.BudgetStream.BudgetTokens
    s"""
      with ${c75Chain(m)},
      nsy128 as (select term, count(*)::bigint as n_syms from s$m group by term),
      enc128 as (
        select tf.doc_id, sum(tf.tf * coalesce(nsy128.n_syms, 0))::bigint as n_tok
        from tf75 tf left join nsy128 on tf.term = nsy128.term
        group by tf.doc_id),
      st128 as (
        select d.source, sum(enc128.n_tok)::bigint as n_tok
        from documents d join enc128 on d.doc_id = enc128.doc_id
        group by 1),
      tot128 as (select round(sum(sqrt(n_tok::double)), 6) as z from st128),
      q128 as (
        select source,
               (($budget * floor(1000.0 * sqrt(n_tok::double) / z)::bigint) // 1000)::bigint
                 as quota
        from st128, tot128),
      cum128 as (
        select d.doc_id, d.source, e.n_tok,
               sum(e.n_tok) over (partition by d.source
                 order by d.doc_id % $n, d.doc_id
                 rows between unbounded preceding and current row)::bigint as cum
        from documents d join enc128 e on d.doc_id = e.doc_id
        where d.doc_id % 97 <> 0)
      select c.doc_id, c.source,
             case when c.cum <= q.quota then 'keep' else 'quota_full' end as stage,
             c.n_tok
      from cum128 c join q128 q using (source)
      order by c.doc_id
    """
  }

  /** d11: the chunk-store HLL — d2's chunk chain (hex/md5,
    * media_type by doc_id % 3) feeding c154's register/estimator
    * spellings: one HLL contract for text and media. */
  private def d11Sql: String = {
    val chunk = graft.operators.Multimodal.DefaultChunkBytes
    s"""
      with cd11 as (
        select doc_id,
               ['image','audio','video'][(doc_id % 3 + 1)::int] as media_type,
               hex(encode(text)) as hx,
               octet_length(encode(text)) as n_bytes
        from documents),
      xd11 as (
        select doc_id, media_type, hx,
               unnest(range(0, greatest(ceil(n_bytes::double / $chunk)::bigint, 1))) as chunk_idx
        from cd11),
      it11 as (
        select media_type,
               md5(substring(hx, (chunk_idx * ${2 * chunk} + 1)::int, ${2 * chunk})) as sh8
        from xd11),
      rg11 as (${hllRankSql("it11", "media_type, ")}),
      mx11 as (select media_type, reg, max(rnk)::bigint as m
               from rg11 group by 1, 2),
      ex11 as (select media_type, count(distinct sh8)::bigint as exact_distinct
               from it11 group by 1),
      es11 as ${hllEstSql("mx11", "media_type")}
      select e.media_type, x.exact_distinct, e.n_used, e.sum_scaled,
             e.raw_est, e.lc_est, e.est,
             ${Rz("(e.est - x.exact_distinct) / x.exact_distinct", 4)} as rel_err
      from es11 e join ex11 x using (media_type)
      order by media_type
    """
  }

  /** c160: the novelty-quota door — c156's HLL-novelty chain feeding
    * the c112 quantization into c128's per-source prefix replay. */
  private def c160Sql: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    val n = graft.streaming.FunnelStream.AuditBatches
    val budget = graft.streaming.BudgetStream.BudgetTokens
    s"""
      with nv160 as ( $c156Sql ),
      w160 as (select source, greatest(coalesce(est_new, 0), 0)::double as w
               from nv160),
      tz160 as (select round(sum(sqrt(w)), 6) as z from w160),
      q160 as (
        select source,
               case when z > 0
                 then (($budget * floor(1000.0 * sqrt(w) / z)::bigint) // 1000)::bigint
                 else 0 end as quota
        from w160, tz160),
      ${c75Chain(m)},
      nsy160 as (select term, count(*)::bigint as n_syms from s$m group by term),
      enc160 as (
        select tf.doc_id, sum(tf.tf * coalesce(nsy160.n_syms, 0))::bigint as n_tok
        from tf75 tf left join nsy160 on tf.term = nsy160.term
        group by tf.doc_id),
      cum160 as (
        select d.doc_id, d.source, e.n_tok,
               sum(e.n_tok) over (partition by d.source
                 order by d.doc_id % $n, d.doc_id
                 rows between unbounded preceding and current row)::bigint as cum
        from documents d join enc160 e on d.doc_id = e.doc_id
        where d.doc_id % 97 <> 0)
      select c.doc_id, c.source,
             case when c.cum <= coalesce(q.quota, 0) then 'keep'
                  else 'quota_full' end as stage,
             c.n_tok
      from cum160 c left join q160 q using (source)
      order by c.doc_id
    """
  }

  /** c165: the novelty-composed door replayed — the row-local quality
    * cascade (c67's stateless spelling), c160's novelty-quota
    * arithmetic metering the QUALITY SURVIVORS per source, then the
    * global cutoff as a conditional prefix sum over the quota
    * survivors. Each stage's refusals add zero to the next stage's
    * running sum — the oracle's windows spell the fairness property
    * directly. */
  private def c165Sql: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    val n = graft.streaming.FunnelStream.AuditBatches
    val budget = graft.streaming.BudgetStream.BudgetTokens
    val gbudget = graft.streaming.BudgetStream.ComposedBudget
    s"""
      with nv165 as ( $c156Sql ),
      w165 as (select source, greatest(coalesce(est_new, 0), 0)::double as w
               from nv165),
      tz165 as (select round(sum(sqrt(w)), 6) as z from w165),
      nq165 as (
        select source,
               case when z > 0
                 then (($budget * floor(1000.0 * sqrt(w) / z)::bigint) // 1000)::bigint
                 else 0 end as quota
        from w165, tz165),
      ${c75Chain(m)},
      nsy165 as (select term, count(*)::bigint as n_syms from s$m group by term),
      enc165 as (
        select tf.doc_id, sum(tf.tf * coalesce(nsy165.n_syms, 0))::bigint as n_tok
        from tf75 tf left join nsy165 on tf.term = nsy165.term
        group by tf.doc_id),
      pop165 as (select doc_id, text, source from documents where doc_id % 97 <> 0),
      sig165 as (
        select doc_id,
               len(w) as n_tokens,
               round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) as en_score,
               round(((length(text) - length(replace(text, 'th', ''))) / 2
                    + (length(text) - length(replace(text, 'he', ''))) / 2
                    + (length(text) - length(replace(text, 'in', ''))) / 2
                    + (length(text) - length(replace(text, 'er', ''))) / 2
                     )::double / length(text), 4) as en_ngram_score,
               round(len(list_distinct(w))::double / len(w), 4) as distinct_ratio,
               len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+'))
                 + len(regexp_extract_all(text, '[0-9]+')) as n_pii
        from (select doc_id, text, string_split(text, ' ') as w from pop165)),
      ql165 as (
        select doc_id,
               case when n_tokens < 5 then 'too_short'
                    when not (en_score > 0.01 or en_ngram_score > 0.02) then 'non_en'
                    when distinct_ratio < 0.3 then 'repetitive'
                    when n_pii > 20 then 'pii_heavy'
                    else 'keep' end as qreason
        from sig165),
      cum165 as (
        select p.doc_id, p.source, e.n_tok, ql.qreason,
               sum(case when ql.qreason = 'keep' then e.n_tok else 0 end) over (
                 partition by p.source order by p.doc_id % $n, p.doc_id
                 rows between unbounded preceding and current row)::bigint as cum
        from pop165 p
        join enc165 e on p.doc_id = e.doc_id
        join ql165 ql on ql.doc_id = p.doc_id),
      s165 as (
        select c.doc_id, c.source, c.n_tok, c.qreason,
               (c.qreason = 'keep' and c.cum <= coalesce(q.quota, 0)) as quota_ok
        from cum165 c left join nq165 q using (source)),
      g165 as (
        select doc_id, source, n_tok, qreason, quota_ok,
               sum(case when quota_ok then n_tok else 0 end) over (
                 order by doc_id % $n, doc_id
                 rows between unbounded preceding and current row)::bigint as gcum
        from s165)
      select doc_id, source,
             case when qreason <> 'keep' then qreason
                  when not quota_ok then 'quota_full'
                  when gcum <= $gbudget then 'keep'
                  else 'budget_full' end as stage,
             n_tok
      from g165 order by doc_id
    """
  }

  /** c143: the composed door replayed — c128's quota stage verbatim,
    * then c126's global cutoff as a CONDITIONAL prefix sum over the
    * quota survivors only (refused mass consumes no budget). */
  /** The composed door's replay chain (CTE list, no WITH, assumes
    * [[c75Chain]]'s tf75/s<merges> are in scope) ending in g<sfx>
    * with (doc_id, source, n_tok, quota_ok, gcum) — ONE spelling for
    * c143's audit and c148's hand-off. */
  private def composedChain(sfx: String): String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    val n = graft.streaming.FunnelStream.AuditBatches
    val budget = graft.streaming.BudgetStream.BudgetTokens
    s"""nsy$sfx as (select term, count(*)::bigint as n_syms from s$m group by term),
      enc$sfx as (
        select tf.doc_id, sum(tf.tf * coalesce(nsy$sfx.n_syms, 0))::bigint as n_tok
        from tf75 tf left join nsy$sfx on tf.term = nsy$sfx.term
        group by tf.doc_id),
      st$sfx as (
        select d.source, sum(enc$sfx.n_tok)::bigint as n_tok
        from documents d join enc$sfx on d.doc_id = enc$sfx.doc_id
        group by 1),
      tot$sfx as (select round(sum(sqrt(n_tok::double)), 6) as z from st$sfx),
      q$sfx as (
        select source,
               (($budget * floor(1000.0 * sqrt(n_tok::double) / z)::bigint) // 1000)::bigint
                 as quota
        from st$sfx, tot$sfx),
      cum$sfx as (
        select d.doc_id, d.source, e.n_tok,
               sum(e.n_tok) over (partition by d.source
                 order by d.doc_id % $n, d.doc_id
                 rows between unbounded preceding and current row)::bigint as cum
        from documents d join enc$sfx e on d.doc_id = e.doc_id
        where d.doc_id % 97 <> 0),
      s$sfx as (
        select c.doc_id, c.source, c.n_tok, (c.cum <= q.quota) as quota_ok
        from cum$sfx c join q$sfx q using (source)),
      g$sfx as (
        select doc_id, source, n_tok, quota_ok,
               sum(case when quota_ok then n_tok else 0 end) over (
                 order by doc_id % $n, doc_id
                 rows between unbounded preceding and current row)::bigint as gcum
        from s$sfx)"""
  }

  private def c143Sql: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    val gbudget = graft.streaming.BudgetStream.ComposedBudget
    s"""
      with ${c75Chain(m)},
      ${composedChain("143")}
      select doc_id, source,
             case when not quota_ok then 'quota_full'
                  when gcum <= $gbudget then 'keep'
                  else 'budget_full' end as stage,
             n_tok
      from g143 order by doc_id
    """
  }

  /** c148: the door→schedule hand-off replayed — the composed door's
    * keeps (c143's chain), binned by c129's pinned base-vintage cuts,
    * the incremental per-batch appends collapsed into their exact
    * closed form: ONE row_number per shard ordered by (batch, bin
    * desc, shuffle_key). */
  private def c148Sql: String = {
    val n = graft.streaming.FunnelStream.AuditBatches
    s"""
      with $c148Chain
      select doc_id, source, bin, shard,
             row_number() over (partition by shard
               order by doc_id % $n, bin desc, shuffle_key)::bigint as pos,
             (doc_id % $n)::bigint as batch_id
      from sh148
      order by shard, pos
    """
  }

  /** The schedule rows priced and positioned — sh148 joined to the
    * token chain inside ONE CTE whose output exposes a bare `doc_id`,
    * so downstream predicates (the registry's, the pack window's)
    * resolve naturally instead of being string-rewritten against the
    * join's qualified names. Shared by c161 and c164. */
  private def sched148Cte: String = {
    val n = graft.streaming.FunnelStream.AuditBatches
    s"""sched148 as (
        select sh148.doc_id as doc_id, source, bin, shard,
               row_number() over (partition by shard
                 order by sh148.doc_id % $n, bin desc, shuffle_key)::bigint as pos,
               (sh148.doc_id % $n)::bigint as batch_id,
               enc148.n_tok
        from sh148 join enc148 on sh148.doc_id = enc148.doc_id)"""
  }

  /** c161: c148's schedule rows with the door-time mask evidence —
    * registry membership + token mass from the pricing chain. */
  private def c161Sql: String = {
    val anyPred = graft.operators.TextAnalysis.BenchRegistry
      .map(s => "(" + s.pred + ")").mkString(" or ")
    s"""
      with $c148Chain,
      $sched148Cte
      select doc_id, source, bin, shard, pos, batch_id, n_tok,
             ($anyPred) as eval_hit
      from sched148
      order by shard, pos
    """
  }

  /** c164: the door-side pack — the whole schedule history replayed
    * as ONE cumulative token window over (shard, pos), cut into
    * sequences by c111's budget arithmetic. */
  private def c164Sql: String = s"""
      with $c148Chain,
      $sched148Cte,
      p164 as (
        select *, sum(n_tok) over (partition by shard order by pos
          rows between unbounded preceding and current row)::bigint as cum
        from sched148)
      select doc_id, source, bin, shard, pos, batch_id, n_tok,
             ((cum - n_tok) // $BUDGET)::bigint as seq_id,
             (cum - n_tok - ((cum - n_tok) // $BUDGET) * $BUDGET)::bigint as start_offset
      from p164 order by shard, pos
    """

  /** c173: the compaction audit — c164's packed replay aggregated per
    * shard (polls, docs, sequences, token mass, membership checksum).
    * The operator reads these numbers back from the COMPACTED store
    * and its sequence-grain snapshot; the oracle re-derives them from
    * the raw arrival history, so any row the re-lay lost or
    * duplicated, and any sequence the snapshot mis-aggregated,
    * hash-fails. */
  private def c173Sql: String = s"""
      with $c148Chain,
      $sched148Cte,
      p173 as (
        select *, sum(n_tok) over (partition by shard order by pos
          rows between unbounded preceding and current row)::bigint as cum
        from sched148)
      select shard,
             count(distinct batch_id)::bigint as n_batches,
             count(*)::bigint as n_docs,
             count(distinct (cum - n_tok) // $BUDGET)::bigint as n_seqs,
             sum(n_tok)::bigint as sum_tok,
             bit_xor(('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint) as doc_checksum
      from p173 group by shard order by shard
    """

  /** The door→schedule chain (WITH body ending in sh148; enc148 in
    * scope for pricing) — shared by c148 and c161. */
  private def c148Chain: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    val gbudget = graft.streaming.BudgetStream.ComposedBudget
    val bins = graft.operators.TextAnalysis.QualityBins
    val basePred =
      s"('0x' || substr(md5(doc_id::varchar), 1, 7))::bigint % 100 < ${graft.operators.Dedup.DeltaBasePct}"
    def qOf(tbl: String, cte: String) = s"""
      $cte as (
        select source, doc_id,
               round(0.3 * least(len(w)::double / 100.0, 1.0)
                   + 0.4 * round(len(list_distinct(w))::double / len(w), 4)
                   + 0.3 * least(round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) * 5.0, 1.0), 5) as quality
        from (select source, doc_id, string_split(text, ' ') as w from $tbl))"""
    s"""${c75Chain(m)},
      ${composedChain("148")},
      keeps148 as (
        select doc_id, source from g148
        where quota_ok and gcum <= $gbudget),
      dv148 as (select * from documents where $basePred),
      ${keepsChain("148v", "dv148")},
      ${qOf("kept148v", "qv148")},
      bv148 as (
        select source, doc_id, quality,
               ntile($bins) over (partition by source
                 order by quality, doc_id)::bigint as bin
        from qv148),
      cuts148 as (select source, bin, max(quality) as cut from bv148 group by 1, 2),
      t148 as (select d.source, d.doc_id, d.text
               from documents d join keeps148 using (doc_id)),
      ${qOf("t148", "qq148")},
      bin148 as (
        select q.doc_id, q.source,
               coalesce(min(c.bin) filter (where c.cut >= q.quality), $bins)::bigint as bin
        from qq148 q left join cuts148 c on c.source = q.source
        group by q.doc_id, q.source, q.quality),
      k148 as (
        select doc_id, source, bin,
               md5('${graft.operators.Sampling.ShuffleSeed}' || ':' || doc_id::varchar) as shuffle_key
        from bin148),
      sh148 as (
        select *, ('0x' || substr(shuffle_key, 1, 7))::bigint
                    % ${graft.operators.Sampling.ShuffleShards} as shard
        from k148)"""
  }

  /** c153: the ledger report replayed from the arrival history —
    * both the decision-grain stage counts and the ledger-grain
    * offered/survivor masses come from ONE chain, so a ledger row
    * that drifted from its decisions hash-fails. */
  private def c153Sql: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    val n = graft.streaming.FunnelStream.AuditBatches
    val gb = graft.streaming.BudgetStream.ComposedBudget
    s"""
      with ${c75Chain(m)},
      ${composedChain("153")}
      select (doc_id % $n)::bigint as batch_id,
             count(*)::bigint as n_arrivals,
             sum(n_tok)::bigint as offered_tok,
             sum(case when quota_ok then n_tok else 0 end)::bigint as survivor_tok,
             sum(case when quota_ok and gcum <= $gb then n_tok else 0 end)::bigint as kept_tok,
             sum(case when quota_ok and gcum <= $gb then 1 else 0 end)::bigint as n_keep,
             sum(case when not quota_ok then 1 else 0 end)::bigint as n_quota_full,
             sum(case when quota_ok and gcum > $gb then 1 else 0 end)::bigint as n_budget_full
      from g153 group by 1 order by batch_id
    """
  }

  /** c152: the mask budget — the c111 chain once, whole-shard and
    * masked-leg aggregates side by side. */
  private def c152Sql: String = {
    val anyPred = graft.operators.TextAnalysis.BenchRegistry
      .map(s => s"(${s.pred})").mkString(" or ")
    s"""
      with p152 as ( $c111Sql )
      select shard,
             count(distinct seq_id)::bigint as n_seqs,
             count(*)::bigint as n_docs,
             sum(n_tok)::bigint as sum_tok,
             sum(case when $anyPred then 1 else 0 end)::bigint as n_masked_docs,
             count(distinct case when $anyPred then seq_id end)::bigint as n_masked_seqs,
             coalesce(sum(case when $anyPred then n_tok end), 0)::bigint as masked_tok,
             (sum(n_tok) - coalesce(sum(case when $anyPred then n_tok end), 0))::bigint
               as effective_tok,
             round((sum(n_tok) - coalesce(sum(case when $anyPred then n_tok end), 0))::double
                   / sum(n_tok), 4) as effective_frac
      from p152 group by shard order by shard
    """
  }

  /** c126: the budget gate's at-rest replay — the cutoff rule IS one
    * prefix sum: n_tok from the c75 chain, cumulative offered mass
    * over (batch = doc_id % n, doc_id) arrival order, admit iff the
    * running total stays within the budget. */
  private def c126Sql: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    val n = graft.streaming.FunnelStream.AuditBatches
    val budget = graft.streaming.BudgetStream.BudgetTokens
    s"""
      with ${c75Chain(m)},
      nsy126 as (select term, count(*)::bigint as n_syms from s$m group by term),
      enc126 as (
        select tf.doc_id, sum(tf.tf * coalesce(nsy126.n_syms, 0))::bigint as n_tok
        from tf75 tf left join nsy126 on tf.term = nsy126.term
        group by tf.doc_id),
      cum126 as (
        select doc_id, n_tok,
               sum(n_tok) over (order by doc_id % $n, doc_id
                 rows between unbounded preceding and current row)::bigint as cum
        from enc126 where doc_id % 97 <> 0)
      select doc_id,
             case when cum <= $budget then 'keep' else 'budget_full' end as stage,
             n_tok
      from cum126 order by doc_id
    """
  }

  /** c124: the per-source acquisition yield — the funnel's keeps
    * ([[keepsChain]]), the stored tokenizer's BPE mass (c75's chain),
    * span cuts over the KEPT corpus (c33's chain rebased + c34's
    * island merge), one source-grain rollup. The BPE-net estimate is
    * exact integer arithmetic (div), the fractions 4-rounded. */
  private def c124Sql: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    s"""
      with ${c75Chain(m)},
      nsy124 as (select term, count(*)::bigint as n_syms from s$m group by term),
      enc124 as (
        select tf.doc_id,
               sum(tf.tf * coalesce(nsy124.n_syms, 0))::bigint as n_tok
        from tf75 tf left join nsy124 on tf.term = nsy124.term
        group by tf.doc_id),
      ${keepsChain()},
      ${c33Chain("kept105")},
      iv124 as (select doc_b as doc_id, b_start as s, b_start + n_tokens as e from spans),
      mx124 as (
        select doc_id, s, e,
               max(e) over (partition by doc_id order by s, e
                 rows between unbounded preceding and 1 preceding) as maxe
        from iv124),
      isl124 as (
        select doc_id, s, e,
               sum(case when maxe is null or s > maxe then 1 else 0 end)
                 over (partition by doc_id order by s, e) as island
        from mx124),
      r124 as (select doc_id, island, min(s) as cs, max(e) as ce
               from isl124 group by doc_id, island),
      cut124 as (select doc_id, sum(ce - cs)::bigint as cut_tokens
                 from r124 group by doc_id),
      ws124 as (select doc_id, len(string_split(text, ' '))::bigint as ws from kept105),
      per124 as (
        select d.source, d.doc_id, e.n_tok,
               (k.doc_id is not null) as kept,
               coalesce(w.ws, 0)::bigint as ws,
               coalesce(c.cut_tokens, 0)::bigint as cut
        from (select doc_id, source from documents where doc_id % 97 <> 0) d
        join enc124 e using (doc_id)
        left join keeps105 k using (doc_id)
        left join ws124 w using (doc_id)
        left join cut124 c using (doc_id)),
      g124 as (
        select source,
               count(*)::bigint as n_docs,
               (count(*) filter (where kept))::bigint as n_kept,
               sum(n_tok)::bigint as bpe_raw,
               coalesce(sum(n_tok) filter (where kept), 0)::bigint as bpe_kept,
               sum(ws)::bigint as ws_kept,
               sum(cut)::bigint as ws_cut
        from per124 group by source)
      select source, n_docs, n_kept,
             round(n_kept::double / n_docs, 4) as keep_rate,
             bpe_raw, bpe_kept, ws_kept, ws_cut,
             case when ws_kept > 0 then round(ws_cut::double / ws_kept, 4) end as cut_frac,
             (bpe_kept - case when ws_kept > 0
                then (bpe_kept * ws_cut) // ws_kept else 0 end)::bigint as bpe_net_est,
             ${Rz("""(bpe_kept - case when ws_kept > 0
                then (bpe_kept * ws_cut) // ws_kept else 0 end)::double / bpe_raw""", 4)} as yield_frac
      from g124 order by source
    """
  }

  /** c111: c105's schedule chain + c103's stored-tokenizer counts,
    * the packing prefix sum over the KEPT schedule's (shard, pos). */
  private def c111Sql: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    s"""
      with ${c75Chain(m)},
      nsy111 as (select term, count(*)::bigint as n_syms from s$m group by term),
      enc111 as (
        select tf.doc_id,
               sum(tf.tf * coalesce(nsy111.n_syms, 0))::bigint as n_tok
        from tf75 tf left join nsy111 on tf.term = nsy111.term
        group by tf.doc_id),
      ${c105Chain()},
      a111 as (
        select sched105.doc_id, source, bin, shard, pos, enc111.n_tok,
               sum(n_tok) over (partition by shard order by pos
                 rows between unbounded preceding and current row)::bigint as cum
        from sched105 join enc111 on sched105.doc_id = enc111.doc_id)
      select doc_id, source, bin, shard, pos,
             ((cum - n_tok) // $BUDGET)::bigint as seq_id,
             (cum - n_tok - ((cum - n_tok) // $BUDGET) * $BUDGET)::bigint as start_offset,
             n_tok
      from a111 order by shard, pos
    """
  }

  /** c117: c111's mounted packing aggregated to sequence grain, the
    * epoch grid exploded, epoch 0 in curriculum order and later
    * epochs under the seeded md5 shuffle. */
  private def c117Sql: String = {
    val e = graft.operators.Sampling.EpochCount
    val seed = graft.operators.Sampling.ShuffleSeed
    s"""
      with p117 as ( $c111Sql ),
      s117 as (
        select shard, seq_id, count(*)::bigint as n_docs, sum(n_tok)::bigint as sum_tok
        from p117 group by 1, 2),
      e117 as (select s117.*, unnest(range(0, $e))::bigint as epoch from s117),
      r117 as (
        select epoch, shard, seq_id, n_docs, sum_tok,
               row_number() over (partition by epoch, shard
                 order by case when epoch = 0 then seq_id else 0 end,
                          md5('$seed' || ':' || epoch::varchar || ':'
                            || shard::varchar || ':' || seq_id::varchar),
                          seq_id)::bigint as epoch_pos
        from e117)
      select epoch, shard, seq_id, epoch_pos, n_docs, sum_tok
      from r117 order by epoch, shard, epoch_pos
    """
  }

  /** c120: c104's index aggregate over the MOUNTED (keeps-only)
    * packing — c111's full chain as a CTE, then ONE (shard, seq_id)
    * group; the index c117's epoch plan actually resolves in. */
  private def c120Sql: String = s"""
      with p120 as ( $c111Sql )
      select shard, seq_id, count(*)::bigint as n_docs,
             sum(n_tok)::bigint as sum_tok,
             min(pos)::bigint as first_pos, max(pos)::bigint as last_pos,
             max(bin)::bigint as max_bin, min(bin)::bigint as min_bin,
             round(sum(n_tok)::double / $BUDGET, 4) as fill_frac
      from p120 group by shard, seq_id order by shard, seq_id
    """

  /** c132: tokenizer fertility by (lang, source) — the shared c75
    * trainer chain's symbol-table counts (c111's enc spelling) rolled
    * up over the documents' declared language and source. */
  private def c132Sql: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    s"""
      with ${c75Chain(m)},
      nsy132 as (select term, count(*)::bigint as n_syms from s$m group by term),
      enc132 as (
        select tf.doc_id, sum(tf.tf * coalesce(nsy132.n_syms, 0))::bigint as n_tok
        from tf75 tf left join nsy132 on tf.term = nsy132.term
        group by tf.doc_id),
      f132 as (
        select d.lang, d.source, count(*)::bigint as n_docs,
               sum(length(d.text))::bigint as n_chars,
               sum(e.n_tok)::bigint as n_tok
        from documents d join enc132 e using (doc_id)
        group by 1, 2)
      select lang, source, n_docs, n_chars, n_tok,
             round(n_chars::double / n_tok, 4) as chars_per_tok,
             round(n_tok * 100.0 / n_chars, 4) as toks_per_100ch
      from f132 order by lang, source
    """
  }

  /** c134: the count-min sketch replayed exactly — cells are sums of
    * colliding bigram counts per (hash row, position), the estimate
    * is the min over rows; geometry interpolated from the operator
    * constants so the two engines cannot disagree on the hash. */
  private def c134Sql: String = {
    val w = graft.operators.TextAnalysis.CmsWidth
    val d = graft.operators.TextAnalysis.CmsDepth
    val k = graft.operators.TextAnalysis.CmsTopK
    s"""
      with t134 as (
        select unnest([w[i]||' '||w[i+1] for i in range(1, len(w))]) as bigram
        from (select string_split(text, ' ') as w from documents)),
      c134 as (select bigram, count(*)::bigint as cnt from t134 group by 1),
      tp134 as (
        select bigram, cnt, i,
               ('0x' || substr(md5(bigram), (i*7+1)::int, 7))::bigint % $w as pos
        from c134, unnest(range(0, $d)) as t(i)),
      cl134 as (select i, pos, sum(cnt)::bigint as cell from tp134 group by 1, 2),
      e134 as (
        select tp134.bigram, tp134.cnt, min(cl134.cell)::bigint as est
        from tp134 join cl134 using (i, pos) group by 1, 2)
      select bigram, cnt as exact, est, (est - cnt)::bigint as overcount
      from e134 order by est desc, bigram limit $k
    """
  }

  /** c149: the distributed-merge audit — per-source cell tables,
    * cell-wise summed, against the one-pass global sketch; both sides
    * derived independently so the identity is checked, not assumed. */
  private def c149Sql: String = {
    val w = graft.operators.TextAnalysis.CmsWidth
    val d = graft.operators.TextAnalysis.CmsDepth
    s"""
      with t149 as (
        select source, unnest([w[i]||' '||w[i+1] for i in range(1, len(w))]) as bigram
        from (select source, string_split(text, ' ') as w from documents)),
      sc149 as (select source, bigram, count(*)::bigint as cnt from t149 group by 1, 2),
      sp149 as (
        select source, cnt, i,
               ('0x' || substr(md5(bigram), (i*7+1)::int, 7))::bigint % $w as pos
        from sc149, unnest(range(0, $d)) as t(i)),
      scell149 as (select i, pos, source, sum(cnt)::bigint as cell
                   from sp149 group by 1, 2, 3),
      m149 as (select i, pos, sum(cell)::bigint as m from scell149 group by 1, 2),
      g0149 as (select bigram, count(*)::bigint as cnt from t149 group by 1),
      gp149 as (
        select cnt, i,
               ('0x' || substr(md5(bigram), (i*7+1)::int, 7))::bigint % $w as pos
        from g0149, unnest(range(0, $d)) as t(i)),
      gcell149 as (select i, pos, sum(cnt)::bigint as g from gp149 group by 1, 2),
      j149 as (
        select i, pos, coalesce(m, 0)::bigint as m, coalesce(g, 0)::bigint as g
        from m149 full join gcell149 using (i, pos))
      select i::bigint as depth, count(*)::bigint as n_cells,
             sum(g)::bigint as mass, max(g)::bigint as max_cell,
             sum(case when m <> g then 1 else 0 end)::bigint as n_diff_cells,
             max(abs(m - g))::bigint as max_abs_diff
      from j149 group by 1 order by depth
    """
  }

  /** The HLL register CTE body over a frame exposing `sh8` (+ key
    * cols): 60-bit md5-slice hash, register = top 8 bits, rank =
    * 53 − binary length of the low 52 bits (exact integers — no
    * float in the sketch state). */
  private def hllRankSql(src: String, keySel: String): String = {
    val base = graft.operators.TextAnalysis.HllRankBase
    s"""select ${keySel}v // $base as reg,
             (case when v % $base = 0 then 53
                   else 53 - length(bin(v % $base)) end)::bigint as rnk
      from (select ${keySel}('0x' || substr(md5(sh8), 1, 15))::bigint as v
            from $src)"""
  }

  /** HLL estimate subquery over a (key…, reg, m) register CTE —
    * mirrors [[graft.operators.TextAnalysis.hllEstimate]]: exact
    * bigint register sum (Σ 2^(53−M), empty registers 2^53), one
    * float division by the Scala-interpolated α·m²·2^53, linear
    * counting below 2.5m. */
  private def hllEstSql(regs: String, key: String): String = {
    val m = graft.operators.TextAnalysis.HllRegisters
    val numer = graft.operators.TextAnalysis.HllNumer
    val keySel = if (key.isEmpty) "" else s"$key, "
    val keyGrp = if (key.isEmpty) "" else s"group by $key"
    val scaled = s"(sum_used + ($m - n_used) * 9007199254740992)"
    s"""(
      select ${keySel}n_used, $scaled::bigint as sum_scaled,
             round($numer / $scaled, 4) as raw_est,
             case when $m - n_used > 0
               then round(${m}.0 * ln(${m}.0 / ($m - n_used)), 4) end as lc_est,
             case when $numer / $scaled <= ${2.5 * m} and $m - n_used > 0
               then round(${m}.0 * ln(${m}.0 / ($m - n_used)), 4)
               else round($numer / $scaled, 4) end as est
      from (select ${keySel}count(*)::bigint as n_used,
                   sum((1::bigint << (53 - m)))::bigint as sum_used
            from $regs $keyGrp))"""
  }

  /** c154: the HLL distinct counter replayed — registers/ranks in
    * exact integer arithmetic, the estimate off the exact register
    * sum, the linear-counting correction, c137's exact-distinct
    * audit leg. */
  private def c154Sql: String = s"""
      with sh154 as ($SH8),
      it154 as (select d.source, sh154.sh8
                from sh154 join documents d using (doc_id)),
      rg154 as (${hllRankSql("it154", "source, ")}),
      mx154 as (select source, reg, max(rnk)::bigint as m
                from rg154 group by 1, 2),
      ex154 as (select source, count(distinct sh8)::bigint as exact_distinct
                from it154 group by 1),
      es154 as ${hllEstSql("mx154", "source")}
      select e.source, x.exact_distinct, e.n_used, e.sum_scaled,
             e.raw_est, e.lc_est, e.est,
             ${Rz("(e.est - x.exact_distinct) / x.exact_distinct", 4)} as rel_err
      from es154 e join ex154 x using (source)
      order by source
    """

  /** c155: HLL mergeability — per-source registers max-merged vs the
    * one-pass global table, both derived independently; the merged
    * and global estimates off the shared estimator. */
  private def c155Sql: String = s"""
      with sh155 as ($SH8),
      it155 as (select d.source, sh155.sh8
                from sh155 join documents d using (doc_id)),
      rg155 as (${hllRankSql("it155", "source, ")}),
      mx155 as (select source, reg, max(rnk)::bigint as m
                from rg155 group by 1, 2),
      mg155 as (select reg, max(m)::bigint as m from mx155 group by 1),
      rgg155 as (${hllRankSql("sh155", "")}),
      gg155 as (select reg, max(rnk)::bigint as m from rgg155 group by 1),
      df155 as (select coalesce(a.m, 0)::bigint as ma, coalesce(b.m, 0)::bigint as mb
                from mg155 a full join gg155 b using (reg)),
      d155 as (select count(*)::bigint as n_occupied,
                      sum(case when ma <> mb then 1 else 0 end)::bigint as n_diff_regs,
                      max(greatest(ma, mb))::bigint as max_rank
               from df155),
      em155 as ${hllEstSql("(select 1 as k, reg, m from mg155)", "k")},
      eg155 as ${hllEstSql("(select 1 as k, reg, m from gg155)", "k")}
      select d155.n_occupied, d155.n_diff_regs, d155.max_rank,
             em155.sum_scaled as sum_scaled_merged, em155.est as est_merged,
             eg155.sum_scaled as sum_scaled_global, eg155.est as est_global
      from d155, em155, eg155
    """

  /** c156: vintage novelty off the sketches — base and union register
    * tables per source, the shared estimator, est_new = difference,
    * beside the exact audit. */
  private def c156Sql: String = {
    val basePred =
      s"('0x' || substr(md5(d.doc_id::varchar), 1, 7))::bigint % 100 < ${graft.operators.Dedup.DeltaBasePct}"
    s"""
      with sh156 as ($SH8),
      it156 as (select d.source, sh156.sh8, ($basePred) as is_base
                from sh156 join documents d on sh156.doc_id = d.doc_id),
      ex156 as (
        select source,
               count(distinct case when is_base then sh8 end)::bigint as exact_base,
               count(distinct sh8)::bigint as exact_union
        from it156 group by 1),
      rb156 as (${hllRankSql("(select source, sh8 from it156 where is_base)", "source, ")}),
      mb156 as (select source, reg, max(rnk)::bigint as m from rb156 group by 1, 2),
      ru156 as (${hllRankSql("it156", "source, ")}),
      mu156 as (select source, reg, max(rnk)::bigint as m from ru156 group by 1, 2),
      eb156 as ${hllEstSql("mb156", "source")},
      eu156 as ${hllEstSql("mu156", "source")}
      select x.source, x.exact_base, x.exact_union,
             (x.exact_union - x.exact_base)::bigint as exact_new,
             b.est as est_base, u.est as est_union,
             ${Rz("u.est - b.est", 4)} as est_new
      from ex156 x
      join eu156 u using (source)
      left join eb156 b using (source)
      order by source
    """
  }

  /** c166: register drift — base vs union register tables per source
    * (empty register = rank 0), compared as rank distributions over
    * the 256 registers: changed-register count, max rank gain, PSI
    * over the rank histogram, widest proportion gap. Signed columns
    * through Rz. */
  private def c166Sql: String = {
    val m = graft.operators.TextAnalysis.HllRegisters
    val eps = graft.operators.TextAnalysis.DriftEps
    val basePred =
      s"('0x' || substr(md5(d.doc_id::varchar), 1, 7))::bigint % 100 < ${graft.operators.Dedup.DeltaBasePct}"
    s"""
      with sh166 as ($SH8),
      it166 as (select d.source, sh166.sh8, ($basePred) as is_base
                from sh166 join documents d on sh166.doc_id = d.doc_id),
      rb166 as (${hllRankSql("(select source, sh8 from it166 where is_base)", "source, ")}),
      mb166 as (select source, reg, max(rnk)::bigint as m from rb166 group by 1, 2),
      ru166 as (${hllRankSql("it166", "source, ")}),
      mu166 as (select source, reg, max(rnk)::bigint as m from ru166 group by 1, 2),
      src166 as (select distinct source from documents),
      regs166 as (
        select g.source, g.reg,
               coalesce(b.m, 0)::bigint as m_base,
               coalesce(u.m, 0)::bigint as m_cur
        from (select source, r.range as reg from src166, range(0, $m) r) g
        left join mb166 b on b.source = g.source and b.reg = g.reg
        left join mu166 u on u.source = g.source and u.reg = g.reg),
      chg166 as (
        select source,
               sum(case when m_cur <> m_base then 1 else 0 end)::bigint as n_regs_changed,
               max(m_cur - m_base)::bigint as max_rank_gain
        from regs166 group by 1),
      hb166 as (select source, m_base as rk, count(*)::bigint as c
                from regs166 group by 1, 2),
      hc166 as (select source, m_cur as rk, count(*)::bigint as c
                from regs166 group by 1, 2),
      p166 as (
        select g.source, g.rk,
               round(coalesce(b.c, 0)::double / $m, 4) as p_base,
               round(coalesce(c.c, 0)::double / $m, 4) as p_cur
        from (select source, r.range as rk from src166, range(0, 54) r) g
        left join hb166 b on b.source = g.source and b.rk = g.rk
        left join hc166 c on c.source = g.source and c.rk = g.rk),
      g166 as (
        select *, row_number() over (partition by source
          order by abs(p_cur - p_base) desc, rk) as gr
        from p166),
      psi166 as (
        select source,
               ${Rz(s"sum((p_cur - p_base) * ln((p_cur + $eps) / (p_base + $eps)))", 4)} as psi,
               max(case when gr = 1 then rk end)::bigint as max_gap_rank,
               max(case when gr = 1 then ${Rz("p_cur - p_base", 4)} end) as max_gap
        from g166 group by 1)
      select c.source, c.n_regs_changed, c.max_rank_gain,
             p.psi, p.max_gap_rank, p.max_gap
      from chg166 c join psi166 p using (source)
      order by c.source
    """
  }

  /** c167: the live register store replayed — by c155's merge
    * property the door's max-over-log equals the one-pass registers
    * over the whole arrival history, so the oracle is c154's chain
    * over the door population plus the per-source batch count. */
  private def c167Sql: String = {
    val n = graft.streaming.FunnelStream.AuditBatches
    s"""
      with sh167 as ($SH8),
      pop167 as (select doc_id, source from documents where doc_id % 97 <> 0),
      it167 as (select p.source, sh167.sh8, p.doc_id
                from sh167 join pop167 p on sh167.doc_id = p.doc_id),
      rg167 as (${hllRankSql("(select source, sh8 from it167)", "source, ")}),
      mx167 as (select source, reg, max(rnk)::bigint as m from rg167 group by 1, 2),
      nb167 as (select source, count(distinct doc_id % $n)::bigint as n_batches
                from it167 group by 1),
      es167 as ${hllEstSql("mx167", "source")}
      select e.source, b.n_batches, e.n_used, e.sum_scaled,
             e.raw_est, e.lc_est, e.est
      from es167 e join nb167 b using (source)
      order by e.source
    """
  }

  /** d12: the chunk-register door replayed — d11's chunk/register
    * chain over the door population plus per-type batch counts
    * (max-over-log ≡ one-pass by the merge property). */
  private def d12Sql: String = {
    val chunk = graft.operators.Multimodal.DefaultChunkBytes
    val n = graft.streaming.FunnelStream.AuditBatches
    s"""
      with cd12 as (
        select doc_id,
               ['image','audio','video'][(doc_id % 3 + 1)::int] as media_type,
               hex(encode(text)) as hx,
               octet_length(encode(text)) as n_bytes
        from documents where doc_id % 97 <> 0),
      xd12 as (
        select doc_id, media_type, hx,
               unnest(range(0, greatest(ceil(n_bytes::double / $chunk)::bigint, 1))) as chunk_idx
        from cd12),
      it12 as (
        select doc_id, media_type,
               md5(substring(hx, (chunk_idx * ${2 * chunk} + 1)::int, ${2 * chunk})) as sh8
        from xd12),
      rg12 as (${hllRankSql("(select media_type, sh8 from it12)", "media_type, ")}),
      mx12 as (select media_type, reg, max(rnk)::bigint as m
               from rg12 group by 1, 2),
      nb12 as (select media_type, count(distinct doc_id % $n)::bigint as n_batches
               from it12 group by 1),
      es12 as ${hllEstSql("mx12", "media_type")}
      select e.media_type, b.n_batches, e.n_used, e.sum_scaled,
             e.raw_est, e.lc_est, e.est
      from es12 e join nb12 b using (media_type)
      order by e.media_type
    """
  }

  /** c168: drift off the live log — c166's register-PSI body with
    * base = the arrivals BEFORE the latest poll, over the door
    * population (max-over-log ≡ one-pass registers per vintage). */
  private def c168Sql: String = {
    val m = graft.operators.TextAnalysis.HllRegisters
    val eps = graft.operators.TextAnalysis.DriftEps
    val n = graft.streaming.FunnelStream.AuditBatches
    s"""
      with sh168 as ($SH8),
      pop168 as (select doc_id, source from documents where doc_id % 97 <> 0),
      it168 as (select p.source, sh168.sh8,
                       (p.doc_id % $n < ${n - 1}) as is_base
                from sh168 join pop168 p on sh168.doc_id = p.doc_id),
      rb168 as (${hllRankSql("(select source, sh8 from it168 where is_base)", "source, ")}),
      mb168 as (select source, reg, max(rnk)::bigint as m from rb168 group by 1, 2),
      ru168 as (${hllRankSql("(select source, sh8 from it168)", "source, ")}),
      mu168 as (select source, reg, max(rnk)::bigint as m from ru168 group by 1, 2),
      src168 as (select distinct source from it168),
      regs168 as (
        select g.source, g.reg,
               coalesce(b.m, 0)::bigint as m_base,
               coalesce(u.m, 0)::bigint as m_cur
        from (select source, r.range as reg from src168, range(0, $m) r) g
        left join mb168 b on b.source = g.source and b.reg = g.reg
        left join mu168 u on u.source = g.source and u.reg = g.reg),
      chg168 as (
        select source,
               sum(case when m_cur <> m_base then 1 else 0 end)::bigint as n_regs_changed,
               max(m_cur - m_base)::bigint as max_rank_gain
        from regs168 group by 1),
      hb168 as (select source, m_base as rk, count(*)::bigint as c
                from regs168 group by 1, 2),
      hc168 as (select source, m_cur as rk, count(*)::bigint as c
                from regs168 group by 1, 2),
      p168 as (
        select g.source, g.rk,
               round(coalesce(b.c, 0)::double / $m, 4) as p_base,
               round(coalesce(c.c, 0)::double / $m, 4) as p_cur
        from (select source, r.range as rk from src168, range(0, 54) r) g
        left join hb168 b on b.source = g.source and b.rk = g.rk
        left join hc168 c on c.source = g.source and c.rk = g.rk),
      g168 as (
        select *, row_number() over (partition by source
          order by abs(p_cur - p_base) desc, rk) as gr
        from p168),
      psi168 as (
        select source,
               ${Rz(s"sum((p_cur - p_base) * ln((p_cur + $eps) / (p_base + $eps)))", 4)} as psi,
               max(case when gr = 1 then rk end)::bigint as max_gap_rank,
               max(case when gr = 1 then ${Rz("p_cur - p_base", 4)} end) as max_gap
        from g168 group by 1)
      select c.source, c.n_regs_changed, c.max_rank_gain,
             p.psi, p.max_gap_rank, p.max_gap
      from chg168 c join psi168 p using (source)
      order by c.source
    """
  }

  /** c175: the histogram door replayed — c142's sketch half (bin
    * counts + the cumulative-walk quantile estimates, no exact leg:
    * the at-rest c142 already prices sketch-vs-exact) over the door
    * population, plus per-source poll/bin counts. Sum-over-log ≡
    * one-pass bins by additivity, so the oracle re-bins the raw
    * arrival history directly. */
  private def c175Sql: String = {
    val bw = graft.operators.TextAnalysis.HqBinWidth
    val nb = graft.operators.TextAnalysis.HqBins
    val ps = graft.operators.TextAnalysis.HqPcts
    val n = graft.streaming.FunnelStream.AuditBatches
    val pivot = ps.map(p => s"max(case when p = $p then est end)::bigint as p${p}_est")
      .mkString(",\n             ")
    s"""
      with l175 as (
        select source, doc_id, length(text)::bigint as v
        from documents where doc_id % 97 <> 0),
      n175 as (select source, count(*)::bigint as n_docs,
                      count(distinct doc_id % $n)::bigint as n_batches
               from l175 group by 1),
      b175 as (select source, least(v // $bw, ${nb - 1})::bigint as bin,
                      count(*)::bigint as c
               from l175 group by 1, 2),
      nb175 as (select source, count(*)::bigint as n_bins from b175 group by 1),
      r175 as (select n175.source, p, ((n_docs * p + 99) // 100)::bigint as r
               from n175, unnest([${ps.mkString(", ")}]) as t(p)),
      cw175 as (select source, bin,
                       sum(c) over (partition by source order by bin
                         rows between unbounded preceding and current row)::bigint as cum
                from b175),
      e175 as (select c.source, r.p, (min(c.bin) * $bw)::bigint as est
               from cw175 c join r175 r on r.source = c.source and c.cum >= r.r
               group by 1, 2),
      ep175 as (select source, $pivot from e175 group by 1)
      select n.source, n.n_batches, nb175.n_bins, n.n_docs,
             p50_est, p90_est, p99_est
      from n175 n join nb175 using (source) join ep175 using (source)
      order by n.source
    """
  }

  /** c178: the truncated-log read replayed — the full-population
    * one-pass estimates (snapshot ∪ tail ≡ full log by max-merge
    * associativity; the oracle takes the associativity for granted
    * and re-derives the SERVED numbers from raw history), plus the
    * artifact sizes: occupied registers of the pre-latest-poll slice
    * (the snapshot) and of the latest poll alone (the tail). */
  private def c178Sql: String = {
    val n = graft.streaming.FunnelStream.AuditBatches
    s"""
      with sh178 as ($SH8),
      pop178 as (select doc_id, source from documents where doc_id % 97 <> 0),
      it178 as (select p.source, sh178.sh8, p.doc_id % $n as b
                from sh178 join pop178 p on sh178.doc_id = p.doc_id),
      ru178 as (${hllRankSql("(select source, sh8 from it178)", "source, ")}),
      mu178 as (select source, reg, max(rnk)::bigint as m from ru178 group by 1, 2),
      rb178 as (${hllRankSql(s"(select source, sh8 from it178 where b < ${n - 1})", "source, ")}),
      rt178 as (${hllRankSql(s"(select source, sh8 from it178 where b = ${n - 1})", "source, ")}),
      sz178 as (
        select coalesce(s.source, t.source) as source,
               coalesce(s.nsr, 0)::bigint as n_snapshot_rows,
               coalesce(t.ntr, 0)::bigint as n_tail_rows
        from (select source, count(distinct reg) as nsr from rb178 group by 1) s
        full join (select source, count(distinct reg) as ntr from rt178 group by 1) t
          on s.source = t.source),
      es178 as ${hllEstSql("mu178", "source")}
      select e.source, z.n_snapshot_rows, z.n_tail_rows, e.n_used,
             e.sum_scaled, e.raw_est, e.lc_est, e.est
      from es178 e join sz178 z using (source)
      order by e.source
    """
  }

  /** c169: the self-contained novelty door replayed — registers per
    * (source, base|union) over the door population (max-over-log ≡
    * one-pass), sketch-difference novelty, c112's quantization, then
    * c128's per-source prefix sums over arrival order. */
  private def c169Sql: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    val n = graft.streaming.FunnelStream.AuditBatches
    val budget = graft.streaming.BudgetStream.BudgetTokens
    s"""
      with sh169 as ($SH8),
      pop169 as (select doc_id, source from documents where doc_id % 97 <> 0),
      it169 as (select p.source, sh169.sh8, (p.doc_id % $n < ${n - 1}) as is_base
                from sh169 join pop169 p on sh169.doc_id = p.doc_id),
      rb169 as (${hllRankSql("(select source, sh8 from it169 where is_base)", "source, ")}),
      mb169 as (select source, reg, max(rnk)::bigint as m from rb169 group by 1, 2),
      ru169 as (${hllRankSql("(select source, sh8 from it169)", "source, ")}),
      mu169 as (select source, reg, max(rnk)::bigint as m from ru169 group by 1, 2),
      eb169 as ${hllEstSql("mb169", "source")},
      eu169 as ${hllEstSql("mu169", "source")},
      w169 as (select u.source,
                      greatest(coalesce(round(u.est - b.est, 4), 0), 0)::double as w
               from eu169 u left join eb169 b using (source)),
      tz169 as (select round(sum(sqrt(w)), 6) as z from w169),
      q169 as (select source,
                      case when z > 0
                        then (($budget * floor(1000.0 * sqrt(w) / z)::bigint) // 1000)::bigint
                        else 0 end as quota
               from w169, tz169),
      ${c75Chain(m)},
      nsy169 as (select term, count(*)::bigint as n_syms from s$m group by term),
      enc169 as (
        select tf.doc_id, sum(tf.tf * coalesce(nsy169.n_syms, 0))::bigint as n_tok
        from tf75 tf left join nsy169 on tf.term = nsy169.term
        group by tf.doc_id),
      cum169 as (
        select d.doc_id, d.source, e.n_tok,
               sum(e.n_tok) over (partition by d.source
                 order by d.doc_id % $n, d.doc_id
                 rows between unbounded preceding and current row)::bigint as cum
        from documents d join enc169 e on d.doc_id = e.doc_id
        where d.doc_id % 97 <> 0)
      select c.doc_id, c.source,
             case when c.cum <= coalesce(q.quota, 0) then 'keep'
                  else 'quota_full' end as stage,
             c.n_tok
      from cum169 c left join q169 q using (source)
      order by c.doc_id
    """
  }

  /** c170: the compaction audit replayed — per-batch register rows
    * (what the log held) and the one-pass merged table (what the
    * snapshot must hold), both from the raw arrival history. */
  private def c170Sql: String = {
    val n = graft.streaming.FunnelStream.AuditBatches
    s"""
      with sh170 as ($SH8),
      pop170 as (select doc_id, source from documents where doc_id % 97 <> 0),
      it170 as (select p.source, (p.doc_id % $n)::bigint as b, sh170.sh8
                from sh170 join pop170 p on sh170.doc_id = p.doc_id),
      rg170 as (${hllRankSql("it170", "source, b, ")}),
      lg170 as (select distinct source, b, reg from rg170),
      bf170 as (select source, count(distinct b)::bigint as n_batches,
                       count(*)::bigint as rows_before
                from lg170 group by 1),
      mx170 as (select source, reg, max(rnk)::bigint as m
                from rg170 group by 1, 2),
      es170 as ${hllEstSql("mx170", "source")}
      select e.source, b.n_batches, b.rows_before,
             e.n_used, e.sum_scaled, e.raw_est, e.lc_est, e.est
      from es170 e join bf170 b using (source)
      order by e.source
    """
  }

  /** c142: the fixed-width histogram quantile sketch replayed — bin
    * counts, the cumulative walk, rank targets ⌈n·p/100⌉ in exact
    * integer arithmetic, exact order statistics via the same
    * (value, doc_id) total order. */
  private def c142Sql: String = {
    val bw = graft.operators.TextAnalysis.HqBinWidth
    val nb = graft.operators.TextAnalysis.HqBins
    val ps = graft.operators.TextAnalysis.HqPcts
    val pivot = ps.flatMap(p => Seq(
      s"max(case when p = $p then exact end)::bigint as p${p}_exact",
      s"max(case when p = $p then est end)::bigint as p${p}_est",
      s"max(case when p = $p then err end)::bigint as p${p}_err"))
      .mkString(",\n             ")
    s"""
      with l142 as (
        select source, doc_id, length(text)::bigint as v from documents),
      n142 as (select source, count(*)::bigint as n_docs from l142 group by 1),
      r142 as (
        select n142.source, p, ((n_docs * p + 99) // 100)::bigint as r
        from n142, unnest([${ps.mkString(", ")}]) as t(p)),
      b142 as (
        select source, least(v // $bw, ${nb - 1})::bigint as bin,
               count(*)::bigint as c
        from l142 group by 1, 2),
      cw142 as (
        select source, bin,
               sum(c) over (partition by source order by bin
                 rows between unbounded preceding and current row)::bigint as cum
        from b142),
      e142 as (
        select c.source, r.p, (min(c.bin) * $bw)::bigint as est
        from cw142 c join r142 r on r.source = c.source and c.cum >= r.r
        group by 1, 2),
      x142 as (
        select l.source, r.p, l.v as exact
        from (select source, doc_id, v,
                     row_number() over (partition by source
                       order by v, doc_id)::bigint as rk
              from l142) l
        join r142 r on r.source = l.source and l.rk = r.r),
      p142 as (
        select e.source, e.p, x.exact, e.est,
               (e.est - x.exact)::bigint as err
        from e142 e join x142 x using (source, p))
      select p142.source, n142.n_docs,
             $pivot
      from p142 join n142 using (source)
      group by 1, 2 order by source
    """
  }

  /** c150: c142's bin tables diffed across vintages under c91's PSI
    * discipline — base = the md5 percent cut, current = the full
    * corpus; quantile shifts read off each vintage's cumulative
    * walk. Signed columns (psi, max_gap) through [[Rz]]. */
  private def c150Sql: String = histDriftSql("documents",
    s"('0x' || substr(md5(doc_id::varchar), 1, 7))::bigint % 100 < ${graft.operators.Dedup.DeltaBasePct}")

  /** c176: the SAME drift arithmetic over the door population with
    * base = arrivals before the latest poll — the log-sum ≡ one-pass
    * property (each doc lands in exactly one batch) lets the oracle
    * re-bin the raw history instead of mounting the log. */
  private def c176Sql: String = {
    val n = graft.streaming.FunnelStream.AuditBatches
    histDriftSql("(select * from documents where doc_id % 97 <> 0)",
      s"doc_id % $n < ${n - 1}")
  }

  /** The c150/c176 shared body — ONE histogram-drift spelling
    * parameterized on the population and the base-vintage predicate
    * (the Scala twin is TextAnalysis.histDriftOver, likewise shared). */
  private def histDriftSql(pop: String, basePred: String): String = {
    val bw = graft.operators.TextAnalysis.HqBinWidth
    val nb = graft.operators.TextAnalysis.HqBins
    val ps = graft.operators.TextAnalysis.HqPcts
    val eps = graft.operators.TextAnalysis.DriftEps
    val shiftPivot = ps.map(p =>
      s"max(case when p = $p then shift end)::bigint as p${p}_shift")
      .mkString(",\n             ")
    s"""
      with l150 as (
        select source, doc_id, length(text)::bigint as v,
               ($basePred) as is_base
        from $pop),
      n150 as (select source,
                      sum(case when is_base then 1 else 0 end)::bigint as n_base,
                      count(*)::bigint as n_cur
               from l150 group by 1
               having n_base > 0),
      bb150 as (select source, least(v // $bw, ${nb - 1})::bigint as bin,
                       count(*)::bigint as c
                from l150 where is_base group by 1, 2),
      bc150 as (select source, least(v // $bw, ${nb - 1})::bigint as bin,
                       count(*)::bigint as c
                from l150 group by 1, 2),
      grid150 as (select source, r.bin::bigint as bin
                  from n150, range(0, $nb) r(bin)),
      p150 as (
        select g.source, g.bin,
               round(coalesce(bb.c, 0)::double / n.n_base, 4) as p_base,
               round(coalesce(bc.c, 0)::double / n.n_cur, 4) as p_cur
        from grid150 g
        left join bb150 bb using (source, bin)
        left join bc150 bc using (source, bin)
        join n150 n using (source)),
      gr150 as (
        select *, row_number() over (partition by source
                    order by abs(p_cur - p_base) desc, bin) as gr
        from p150),
      psi150 as (
        select source,
               ${Rz(s"sum((p_cur - p_base) * ln((p_cur + $eps) / (p_base + $eps)))", 4)} as psi,
               max(case when gr = 1 then bin end)::bigint as max_gap_bin,
               max(case when gr = 1 then ${Rz("p_cur - p_base", 4)} end) as max_gap
        from gr150 group by source),
      r150 as (select source, p,
                      ((n_cur * p + 99) // 100)::bigint as r_cur,
                      ((n_base * p + 99) // 100)::bigint as r_base
               from n150, unnest([${ps.mkString(", ")}]) as t(p)),
      cwc150 as (select source, bin,
                        sum(c) over (partition by source order by bin
                          rows between unbounded preceding and current row)::bigint as cum
                 from bc150),
      cwb150 as (select source, bin,
                        sum(c) over (partition by source order by bin
                          rows between unbounded preceding and current row)::bigint as cum
                 from bb150),
      ec150 as (select c.source, r.p, (min(c.bin) * $bw)::bigint as cur_est
                from cwc150 c join r150 r
                  on r.source = c.source and c.cum >= r.r_cur
                group by 1, 2),
      eb150 as (select c.source, r.p, (min(c.bin) * $bw)::bigint as base_est
                from cwb150 c join r150 r
                  on r.source = c.source and c.cum >= r.r_base
                group by 1, 2),
      sh150 as (select source, p, (cur_est - base_est)::bigint as shift
                from ec150 join eb150 using (source, p)),
      shp150 as (select source, $shiftPivot from sh150 group by 1)
      select n.source, n.n_base, n.n_cur, psi, max_gap_bin, max_gap,
             p50_shift, p90_shift, p99_shift
      from n150 n join psi150 using (source) join shp150 using (source)
      order by source
    """
  }

  /** c130: sequence-grain eval taint — c111's packing chain + one
    * (shard, seq_id) aggregate whose suite predicates interpolate
    * from the SAME [[graft.operators.TextAnalysis.BenchRegistry]] the
    * operator reads (c100's registry discipline: adding a suite is
    * one registry row, zero oracle edits). */
  private def c130Sql: String = {
    val suites = graft.operators.TextAnalysis.BenchRegistry
    val anyPred = suites.map(s => s"(${s.pred})").mkString(" or ")
    val suiteCols = suites.map(s =>
      s"sum(case when ${s.pred} then 1 else 0 end)::bigint as n_eval_${s.id}")
      .mkString(",\n             ")
    s"""
      with p130 as ( $c111Sql ),
      s130 as (
        select shard, seq_id,
               count(*)::bigint as n_docs,
               sum(n_tok)::bigint as sum_tok,
               sum(case when $anyPred then 1 else 0 end)::bigint as n_eval_docs,
               sum(case when $anyPred then n_tok else 0 end)::bigint as eval_tok,
               $suiteCols
        from p130 group by 1, 2)
      select shard, seq_id, n_docs, sum_tok, n_eval_docs, eval_tok,
             ${suites.map(s => s"n_eval_${s.id}").mkString(", ")},
             round(eval_tok::double / sum_tok, 4) as taint_frac,
             (n_eval_docs > 0) as tainted
      from s130 order by shard, seq_id
    """
  }

  /** c139: the decontaminated packing's index — c127's vintage-chain
    * discipline (keeps schedule + packing recomputed within the CLEAN
    * vintage, tokenizer artifact shared from the full corpus), the
    * clean corpus cut by the registry predicates, then c120's
    * sequence aggregate. */
  private def c139Sql: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    val anyPred = graft.operators.TextAnalysis.BenchRegistry
      .map(s => s"(${s.pred})").mkString(" or ")
    val cChain = c105Chain("139", "d139")
    s"""
      with ${c75Chain(m)},
      nsyc as (select term, count(*)::bigint as n_syms from s$m group by term),
      encc as (
        select tf.doc_id, sum(tf.tf * coalesce(nsyc.n_syms, 0))::bigint as n_tok
        from tf75 tf left join nsyc on tf.term = nsyc.term
        group by tf.doc_id),
      d139 as (select * from documents where not ($anyPred)),
      $cChain,
      a139 as (
        select sched139.doc_id, source, bin, shard, pos, encc.n_tok,
               sum(n_tok) over (partition by shard order by pos
                 rows between unbounded preceding and current row)::bigint as cum
        from sched139 join encc on sched139.doc_id = encc.doc_id),
      p139 as (
        select doc_id, source, bin, shard, pos,
               ((cum - n_tok) // $BUDGET)::bigint as seq_id, n_tok
        from a139)
      select shard, seq_id, count(*)::bigint as n_docs,
             sum(n_tok)::bigint as sum_tok,
             min(pos)::bigint as first_pos, max(pos)::bigint as last_pos,
             max(bin)::bigint as max_bin, min(bin)::bigint as min_bin,
             round(sum(n_tok)::double / $BUDGET, 4) as fill_frac
      from p139 group by shard, seq_id order by shard, seq_id
    """
  }

  /** c146: the loss-mask rows — c111's chain cut to the registry
    * members, spans from the packing window's own offsets. */
  private def c146Sql: String = {
    val anyPred = graft.operators.TextAnalysis.BenchRegistry
      .map(s => s"(${s.pred})").mkString(" or ")
    s"""
      with p146 as ( $c111Sql )
      select shard, seq_id, doc_id, start_offset,
             (start_offset + n_tok)::bigint as mask_end,
             (start_offset + n_tok > $BUDGET) as crosses_boundary
      from p146
      where $anyPred
      order by shard, seq_id, start_offset, doc_id
    """
  }

  /** c112: the √n-per-mille temperature weights (c38's quantization)
    * at token grain, then exact integer repeat math under the epoch
    * cap. */
  private def c112Sql: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    val cap = graft.operators.Sampling.RepeatCap
    s"""
      with ${c75Chain(m)},
      nsy112 as (select term, count(*)::bigint as n_syms from s$m group by term),
      enc112 as (
        select tf.doc_id,
               sum(tf.tf * coalesce(nsy112.n_syms, 0))::bigint as n_tok
        from tf75 tf left join nsy112 on tf.term = nsy112.term
        group by tf.doc_id),
      st112 as (
        select d.source, count(*)::bigint as n_docs, sum(enc112.n_tok)::bigint as n_tok
        from documents d join enc112 on d.doc_id = enc112.doc_id
        group by 1),
      tot112 as (
        select sum(n_tok)::bigint as budget_tok,
               round(sum(sqrt(n_tok::double)), 6) as z
        from st112),
      w112 as (
        select source, n_docs, n_tok, budget_tok,
               floor(1000.0 * sqrt(n_tok::double) / z)::bigint as mille
        from st112, tot112),
      t112 as (
        select source, n_docs, n_tok, mille,
               ((budget_tok * mille) // 1000)::bigint as target_tok
        from w112),
      a112 as (
        select *, least(n_tok * $cap, target_tok)::bigint as achieved_tok
        from t112)
      select source, n_docs, n_tok, mille, target_tok, achieved_tok,
             round(achieved_tok::double / n_tok, 4) as epochs,
             (target_tok - achieved_tok)::bigint as deficit
      from a112 order by source
    """
  }

  /** c114: c3's signature chain once, band keys per grid geometry
    * (geometry-prefixed so buckets never mix), bucket cap per
    * geometry, one exact-Jaccard verify over the candidate union. */
  private def c114Sql: String = {
    val bar = 0.5
    val geos = graft.operators.Dedup.LshGeometries
    val bandCtes = geos.map { case (b, r) =>
      val key = (1 to r).map(k => s"sig[$r*j+$k]")
        .mkString(s"'$b' || ':' || j::varchar || ':' || ", " || ':' || ", "")
      s"""bands$b as (
        select $b::bigint as bands, doc_id, md5($key) as band_key
        from sig, unnest(range(0,$b)) as t(j))"""
    }.mkString(",\n      ")
    val allUnion = geos.map { case (b, _) => s"select * from bands$b" }
      .mkString(" union all ")
    s"""
      with $C3_SIG_CHAIN,
      $bandCtes,
      allbands as ($allUnion),
      bsz114 as (
        select bands, band_key, count(*)::bigint as bsz
        from allbands group by 1, 2 having count(*) <= $CAP),
      np114 as (
        select bands, sum(bsz * (bsz - 1) // 2)::bigint as n_probes
        from bsz114 group by bands),
      sdoc114 as (
        select a.bands, a.doc_id, a.band_key
        from allbands a join bsz114 using (bands, band_key)
        qualify row_number() over (partition by a.bands, a.band_key
          order by md5(a.doc_id::varchar), a.doc_id)
          <= ${graft.operators.Dedup.SweepBucketSample}),
      cand114 as (
        select distinct a.bands, a.doc_id as doc_a, b.doc_id as doc_b
        from sdoc114 a join sdoc114 b
          on a.bands = b.bands and a.band_key = b.band_key and a.doc_id < b.doc_id),
      samp114 as (
        select bands, doc_a, doc_b from cand114
        qualify row_number() over (partition by bands
          order by md5(doc_a::varchar || ':' || doc_b::varchar), doc_a, doc_b)
          <= ${graft.operators.Dedup.SweepVerifyCap}),
      pairs114 as (select distinct doc_a, doc_b from samp114),
      sets114 as (select doc_id, list(s) as sh from shd group by doc_id),
      v114 as (
        select doc_a, doc_b,
               round((len(sa.sh) + len(sb.sh) - u.uni)::double / u.uni, 4) as jaccard
        from pairs114
        join sets114 sa on pairs114.doc_a = sa.doc_id
        join sets114 sb on pairs114.doc_b = sb.doc_id,
        lateral (select len(list_distinct(list_concat(sa.sh, sb.sh))) as uni) u),
      tot114 as (
        select count(*)::bigint as n_dups_union from v114 where jaccard >= $bar),
      g114 as (
        select bands, count(*)::bigint as n_verified,
               sum(case when jaccard >= $bar then 1 else 0 end)::bigint as n_dup
        from samp114 join v114 using (doc_a, doc_b)
        group by bands)
      select g114.bands, ($MHK // g114.bands)::bigint as rows_per_band,
             n_probes, n_verified, n_dup,
             round(n_dup::double / n_verified, 4) as precision,
             case when n_dups_union > 0
               then round(n_dup::double / n_dups_union, 4) end as recall
      from g114 join np114 on g114.bands = np114.bands, tot114
      order by g114.bands
    """
  }

  /** c115: c89's stored-weights scoring chain, fixed-width score
    * deciles, the reliability table. */
  private def c115Sql: String = {
    val steps = graft.operators.TextAnalysis.QcTrainSteps
    val bins = graft.operators.TextAnalysis.CalibBins
    s"""${c88Chain(steps)},
      s115 as (
        select t.doc_id,
               round(1.0 / (1.0 + exp(-((w.w0 / 1000000.0) * x0 + (w.w1 / 1000000.0) * x1
                 + (w.w2 / 1000000.0) * x2 + (w.w3 / 1000000.0) * x3
                 + (w.w4 / 1000000.0) * x4 + (w.w5 / 1000000.0)))), 4) as score,
               y::bigint as teacher_keep
        from t cross join w$steps w),
      b115 as (
        select least(floor(score * $bins), ${bins - 1})::bigint as bin, score, teacher_keep
        from s115),
      a115 as (
        select bin, count(*)::bigint as n_docs,
               sum(teacher_keep)::bigint as n_teacher_keep,
               round(avg(score), 4) as mean_score
        from b115 group by bin),
      k115 as (
        select *, round(n_teacher_keep::double / n_docs, 4) as keep_rate from a115)
      select bin, n_docs, n_teacher_keep, mean_score, keep_rate,
             ${Rz("keep_rate - mean_score", 4)} as calib_gap
      from k115 order by bin
    """
  }

  /** c116: c102's sweep as a subquery, F1-scored, the max-F1 row
    * (ties to the lower threshold). */
  private def c116Sql: String = s"""
      select threshold, n_keep, tp, fp, fn, precision, recall, agreement,
             case when 2 * tp + fp + fn > 0
               then round((2 * tp)::double / (2 * tp + fp + fn), 4) end as f1
      from ( $c102Sql ) s102
      order by f1 desc, threshold limit 1
    """

  /** c113: c47's ADC chain at refine depth, exact-cosine re-rank of
    * the candidates only. */
  private def c113Sql: String = {
    val depth = graft.operators.Similarity.RerankDepth
    s"""
      with $C47_CHAIN,
      cand113 as (select q_id, vec_id, rank as adc_rank from r47 where rank <= $depth),
      eq113 as (select vec_id as q_id, embedding as q_emb from embeddings where vec_id < $NQ),
      ex113 as (
        select c.q_id, c.vec_id, c.adc_rank, ${cosN("eq113.q_emb", "e.embedding")} as cos
        from cand113 c
        join embeddings e on c.vec_id = e.vec_id
        join eq113 on c.q_id = eq113.q_id),
      rr113 as (
        select q_id, vec_id, adc_rank, cos,
               row_number() over (partition by q_id
                 order by cos desc nulls last, vec_id)::bigint as rank
        from ex113)
      select q_id, rank, vec_id, adc_rank, cos from rr113
      where rank <= $PTOPK order by q_id, rank
    """
  }

  /** c106: ONE budget-independent prefix sum over the stored-
    * tokenizer counts (c86's enc chain), then the candidate grid
    * exploded per doc-grain row — mirrors the operator's single-
    * window shape. Fill fractions divide by power-of-two budgets, so
    * every addend is an exact binary double and the averages are
    * order-independent. */
  private def c106Sql: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    val grid = graft.operators.Sampling.PackSweepBudgets.mkString(", ")
    s"""
      with ${c75Chain(m)},
      nsy106 as (select term, count(*)::bigint as n_syms from s$m group by term),
      enc106 as (
        select tf.doc_id,
               sum(tf.tf * coalesce(nsy106.n_syms, 0))::bigint as n_tok
        from tf75 tf left join nsy106 on tf.term = nsy106.term
        group by tf.doc_id),
      cum106 as (
        select doc_id % $SHARDS as shard, n_tok,
               sum(n_tok) over (partition by doc_id % $SHARDS order by doc_id
                 rows between unbounded preceding and current row)::bigint as cum
        from enc106),
      x106 as (
        select shard, n_tok, cum, unnest([$grid]::bigint[]) as budget from cum106),
      a106 as (
        select budget, shard, ((cum - n_tok) // budget)::bigint as seq_id, n_tok,
               case when cum - ((cum - n_tok) // budget) * budget > budget
                    then 1 else 0 end as crosses
        from x106),
      s106 as (
        select budget, shard, seq_id, count(*)::bigint as n_docs,
               sum(n_tok)::bigint as sum_tok, sum(crosses)::bigint as n_cross
        from a106 group by 1, 2, 3)
      select budget, count(*)::bigint as n_seqs, sum(n_docs)::bigint as n_docs,
             sum(sum_tok)::bigint as sum_tok, sum(n_cross)::bigint as n_crossing,
             round(avg(sum_tok::double / budget), 4) as avg_fill,
             round(sum(n_docs)::double / count(*), 4) as docs_per_seq,
             round(sum(n_cross)::double / sum(n_docs), 4) as crossing_frac
      from s106 group by budget order by budget
    """
  }

  /** c107: exact pairwise JS over per-source unigram distributions —
    * shared-vocabulary inner join plus the residual one-sided masses
    * (each one-sided term contributes exactly p/2 to JS). */
  private def c107Sql: String = s"""
      with toks107 as (
        select source, unnest(string_split(text, ' ')) as term from documents),
      st107 as (select source, term, count(*)::bigint as cnt from toks107 group by 1, 2),
      tot107 as (select source, sum(cnt)::bigint as n_tok from st107 group by 1),
      p107 as (
        select st107.source, term, cnt::double / n_tok as p
        from st107 join tot107 using (source)),
      pr107 as (
        select a.source as source_a, b.source as source_b, a.p as pa, b.p as pb
        from p107 a join p107 b on a.term = b.term and a.source < b.source)
      select source_a, source_b, count(*)::bigint as n_shared,
             round(sum(pa), 4) as overlap_a, round(sum(pb), 4) as overlap_b,
             ${Rz("""0.5 * sum(pa * log2(2 * pa / (pa + pb)) + pb * log2(2 * pb / (pa + pb)))
                 + 0.5 * (1 - sum(pa)) + 0.5 * (1 - sum(pb))""", 4)} as js_div
      from pr107 group by 1, 2 order by source_a, source_b
    """

  /** c108: the q103 quality spelling weighting a Gumbel top-k draw;
    * u is md5-derived exactly as the operator's conv(...,16,10). */
  private def c108Sql: String = {
    val k = graft.operators.TextAnalysis.GumbelSampleK
    val eps = graft.operators.TextAnalysis.GumbelEps
    val denom = graft.operators.TextAnalysis.GumbelDenom
    s"""
      with q108 as (
        select doc_id, source,
               round(0.3 * least(len(w)::double / 100.0, 1.0)
                   + 0.4 * round(len(list_distinct(w))::double / len(w), 4)
                   + 0.3 * least(round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) * 5.0, 1.0), 5) as quality
        from (select doc_id, source, string_split(text, ' ') as w from documents)),
      g108 as (
        select doc_id, source, quality,
               ${Rz(s"""ln(quality + $eps)
                   - ln(-ln((('0x' || substr(md5('gumbel:' || doc_id::varchar), 1, 7))::bigint + 1)::double / $denom))""", 4)} as gumbel_key
        from q108),
      r108 as (
        select row_number() over (order by gumbel_key desc, doc_id)::bigint as rank,
               doc_id, source, quality, gumbel_key
        from g108)
      select rank, doc_id, source, quality, gumbel_key
      from r108 where rank <= $k order by rank
    """
  }

  /** c177: the sample door replayed — c108's quality-Gumbel chain
    * over the door population, ranked PER SOURCE (top-k-over-log ≡
    * one-pass draw by the top-k merge property). */
  private def c177Sql: String = {
    val k = graft.streaming.BudgetStream.DoorSampleK
    val eps = graft.operators.TextAnalysis.GumbelEps
    val denom = graft.operators.TextAnalysis.GumbelDenom
    s"""
      with q177 as (
        select doc_id, source,
               round(0.3 * least(len(w)::double / 100.0, 1.0)
                   + 0.4 * round(len(list_distinct(w))::double / len(w), 4)
                   + 0.3 * least(round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) * 5.0, 1.0), 5) as quality
        from (select doc_id, source, string_split(text, ' ') as w
              from documents where doc_id % 97 <> 0)),
      g177 as (
        select doc_id, source, quality,
               ${Rz(s"""ln(quality + $eps)
                   - ln(-ln((('0x' || substr(md5('gumbel:' || doc_id::varchar), 1, 7))::bigint + 1)::double / $denom))""", 4)} as gumbel_key
        from q177),
      r177 as (
        select source,
               row_number() over (partition by source
                 order by gumbel_key desc, doc_id)::bigint as rank,
               doc_id, quality, gumbel_key
        from g177)
      select source, rank, doc_id, quality, gumbel_key
      from r177 where rank <= $k order by source, rank
    """
  }

  /** c109: c37's BM25 chain at fusion depth + c6's cosine chain over
    * the same query slice, full-outer joined and RRF-scored; every
    * 1/(c+rank) is the same exact integer-pair division in both
    * engines (::double forced — DuckDB would otherwise divide in
    * decimal). */
  /** The fusion's LEXICAL-leg CTE list (q → lexr): c37's BM25 kernel
    * at fusion depth over the % 101 held-out query slice — ONE
    * spelling shared by c109 (exact-baseline fusion) and c118
    * (stored-index fusion), mirroring the operators' shared
    * bm25Ranked. */
  private def rrfLexCtes: String = {
    val k = graft.operators.Similarity.RrfTopK
    val qb = graft.operators.Similarity.RrfQueryBound
    s"""q as (
        select doc_id as q_id, unnest(list_distinct(w[1:$QTOK])) as term
        from (select doc_id, string_split(text, ' ') as w
              from documents where doc_id % 101 = 0 and doc_id < $qb)),
      terms as (
        select doc_id, unnest(string_split(text, ' ')) as term
        from documents where doc_id % 101 <> 0),
      tf as (select doc_id, term, count(*) as tf from terms group by 1, 2),
      dl as (select doc_id, sum(tf)::bigint as dl from tf group by 1),
      stats as (select sum(dl)::double / count(*) as avgdl, count(*) as n_docs from dl),
      dfx as (select term, count(*) as df from tf group by 1),
      capped as (select term, df from dfx, stats where df * 10 <= n_docs * 9),
      pruned as (
        select term, doc_id, tf from tf
        qualify row_number() over (partition by term
          order by tf desc, doc_id) <= $PCAP),
      contrib as (
        select q.q_id, p.doc_id,
               ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                 * (tf::double * $K1P1)
                 / (tf + $K1 * ($OMB + $B25 * dl / avgdl)) as c
        from q
        join pruned p using (term)
        join capped using (term)
        join dl on p.doc_id = dl.doc_id, stats),
      scored as (select q_id, doc_id, round(sum(c), 4) as score from contrib group by 1, 2),
      lexr0 as (
        select q_id, doc_id,
               row_number() over (partition by q_id
                 order by score desc, doc_id)::bigint as lex_rank
        from scored),
      lexr as (select * from lexr0 where lex_rank <= $k)"""
  }

  private def c109Sql: String = {
    val c = graft.operators.Similarity.RrfC
    val k = graft.operators.Similarity.RrfTopK
    val qb = graft.operators.Similarity.RrfQueryBound
    s"""
      with $rrfLexCtes,
      eq as (select vec_id as q_id, embedding as q_emb
             from embeddings where vec_id % 101 = 0 and vec_id < $qb),
      sems as (
        select eq.q_id, e.vec_id as doc_id, ${cosN("eq.q_emb", "e.embedding")} as cos
        from embeddings e cross join eq
        where e.vec_id % 101 <> 0),
      semr0 as (
        select q_id, doc_id,
               row_number() over (partition by q_id
                 order by cos desc nulls last, doc_id)::bigint as sem_rank
        from sems),
      semr as (select * from semr0 where sem_rank <= $k),
      f as (
        select coalesce(l.q_id, s.q_id) as q_id,
               coalesce(l.doc_id, s.doc_id) as doc_id,
               lex_rank, sem_rank,
               round(coalesce(1.0::double / ($c + lex_rank), 0)
                   + coalesce(1.0::double / ($c + sem_rank), 0), 6) as rrf
        from lexr l full outer join semr s on l.q_id = s.q_id and l.doc_id = s.doc_id),
      r109 as (
        select q_id, doc_id, lex_rank, sem_rank, rrf,
               row_number() over (partition by q_id
                 order by rrf desc, doc_id)::bigint as rank
        from f)
      select q_id, rank, doc_id, lex_rank, sem_rank, rrf
      from r109 where rank <= $k order by q_id, rank
    """
  }

  /** c118: the stored-index fusion — c71's full trained-index replay
    * serving the % 101 query slice at refine depth (the held-out
    * candidate exclusion inside the ADC scan), c113's exact re-rank
    * over only the candidates, then c109's lexical leg + RRF combine
    * verbatim. Every stage is the standalone oracle's own CTE
    * generator, parameterized — the composed replay cannot drift
    * from the per-stage ones. */
  private def c118Sql: String = {
    val c = graft.operators.Similarity.RrfC
    val k = graft.operators.Similarity.RrfTopK
    val qb = graft.operators.Similarity.RrfQueryBound
    val depth = graft.operators.Similarity.RerankDepth
    s"""
      with $rrfLexCtes,
      $TRAINED_CENTROIDS,
      ${residualServeChain("y", s"cent$QITERS",
        queryPred = s"vec_id % 101 = 0 and vec_id < $qb",
        candPred = Some("c.vec_id % 101 <> 0"))},
      cand118 as (select q_id, vec_id, rank as adc_rank from yr where rank <= $depth),
      eq118 as (select vec_id as q_id, embedding as q_emb from embeddings
                where vec_id % 101 = 0 and vec_id < $qb),
      ex118 as (
        select c.q_id, c.vec_id, c.adc_rank, ${cosN("eq118.q_emb", "e.embedding")} as cos
        from cand118 c
        join embeddings e on c.vec_id = e.vec_id
        join eq118 on c.q_id = eq118.q_id),
      semr118 as (
        select q_id, vec_id as doc_id, sem_rank, adc_rank from (
          select q_id, vec_id, adc_rank,
                 row_number() over (partition by q_id
                   order by cos desc nulls last, vec_id)::bigint as sem_rank
          from ex118)
        where sem_rank <= $k),
      f118 as (
        select coalesce(l.q_id, s.q_id) as q_id,
               coalesce(l.doc_id, s.doc_id) as doc_id,
               lex_rank, sem_rank, adc_rank,
               round(coalesce(1.0::double / ($c + lex_rank), 0)
                   + coalesce(1.0::double / ($c + sem_rank), 0), 6) as rrf
        from lexr l full outer join semr118 s on l.q_id = s.q_id and l.doc_id = s.doc_id),
      r118 as (
        select q_id, doc_id, lex_rank, sem_rank, adc_rank, rrf,
               row_number() over (partition by q_id
                 order by rrf desc, doc_id)::bigint as rank
        from f118)
      select q_id, rank, doc_id, lex_rank, sem_rank, adc_rank, rrf
      from r118 where rank <= $k order by q_id, rank
    """
  }

  /** c110: c7's nearest-centroid assignment, even/odd vintage split,
    * PSI term per cell with c91's round-before-log discipline. */
  private def c110Sql: String = {
    val eps = graft.operators.TextAnalysis.DriftEps
    s"""
      with c as (select vec_id as c_id, embedding as c_emb from embeddings where vec_id < $NC),
      ra as (
        select e.vec_id, c.c_id,
               row_number() over (partition by e.vec_id
                 order by ${cosN("e.embedding", "c.c_emb")} desc nulls last, c.c_id) as rn
        from embeddings e cross join c),
      a as (select vec_id, c_id as cluster from ra where rn = 1),
      s as (
        select cluster,
               sum(case when vec_id % 2 = 0 then 1 else 0 end)::bigint as n_base,
               sum(case when vec_id % 2 = 1 then 1 else 0 end)::bigint as n_live
        from a group by cluster),
      t as (select sum(n_base)::bigint as tb, sum(n_live)::bigint as tl from s),
      p as (
        select cluster, n_base, n_live,
               round(n_base::double / tb, 4) as p_base,
               round(n_live::double / tl, 4) as p_live
        from s, t)
      select cluster, n_base, n_live, p_base, p_live,
             ${Rz(s"(p_live - p_base) * ln((p_live + $eps) / (p_base + $eps))", 6)} as psi_term
      from p order by cluster
    """
  }

  lazy val sql: Map[String, String] = {
    val base = sql1 ++ sql2
    base +
      // c140/c141 serve from at-rest lexical artifacts whose contents
      // are LOGICALLY identical to c37's per-query derivation (c140:
      // train-once; c141: base build + exact append — top-cap(A∪B) ⊆
      // top-cap(A) ∪ B makes capped-base + delta re-capping exact),
      // so all three hash-check against the one BM25 spelling —
      // c79/c71's shared-oracle discipline on the lexical side
      ("c140_bm25_stored" -> base("c37_bm25")) +
      ("c141_postings_append" -> base("c37_bm25")) +
      // c151 serves c147's gate from the at-rest sketch artifact; the
      // stored path must be byte-identical to the in-flight one
      ("c151_proj_stored" -> base("c147_proj_serve"))
  }

  private lazy val sql1: Map[String, String] = Map(
    "c88_classifier_train" -> c88Sql,
    "c89_stored_classifier" -> c89Sql,
    "c90_student_funnel" -> c90Sql,
    "c91_feature_drift" -> c91Sql,
    "c92_tokenizer_holdout" -> c92Sql,
    "c93_active_batch" -> c93Sql,
    "c94_pack_boundaries" -> c94Sql,
    "c95_quality_keeper" -> c95Sql,
    "c96_student_gate" -> c96Sql,
    "c97_classifier_refresh" -> c97Sql,
    "c98_export_manifest" -> c98Sql,
    "c99_curriculum" -> c99Sql,
    "c100_multibench_contam" -> c100Sql,
    "c101_manifest_diff" -> c101Sql,
    "c102_threshold_sweep" -> c102Sql,
    "c103_curriculum_pack" -> c103Sql,
    "c104_seq_manifest" -> c104Sql,
    "c105_keeps_schedule" -> c105Sql,
    "c124_source_yield" -> c124Sql,
    "c126_budget_gate" -> c126Sql,
    "c127_seq_vintage_diff" -> c127Sql,
    "c128_quota_gate" -> c128Sql,
    "c143_composed_gate" -> c143Sql,
    "c129_pinned_schedule" -> c129Sql,
    "c106_pack_sweep" -> c106Sql,
    "c107_source_divergence" -> c107Sql,
    "c108_gumbel_sample" -> c108Sql,
    "c109_rrf_fusion" -> c109Sql,
    "c118_rrf_stored" -> c118Sql,
    "c125_fusion_recall" -> c125Sql,
    "c110_embed_drift" -> c110Sql,
    "c111_keeps_pack" -> c111Sql,
    "c112_repeat_mixture" -> c112Sql,
    "c113_pq_rerank" -> c113Sql,
    "c114_lsh_geometry" -> c114Sql,
    "c115_calibration" -> c115Sql,
    "c116_threshold_pick" -> c116Sql,
    "c117_epoch_plan" -> c117Sql,
    "c120_keeps_manifest" -> c120Sql,
    "c130_seq_contam" -> c130Sql,
    "c139_decontam_pack" -> c139Sql,
    "c146_loss_mask" -> c146Sql,
    "c132_fertility" -> c132Sql,
    "c134_cms_heavy" -> c134Sql,
    // c137: the linear-counting table replayed — bucket = the shingle
    // key's own first 16 bits, estimate m·ln(m/V), null at saturation
    "c142_hist_quantiles" -> c142Sql,
    "c137_linear_count" -> {
      val m = graft.operators.TextAnalysis.LcBuckets
      s"""
      with s137 as (
        select d.source, sh.sh8,
               ('0x' || substr(sh.sh8, 1, 4))::bigint as bucket
        from ($SH8) sh join documents d using (doc_id)),
      a137 as (
        select source, count(distinct sh8)::bigint as exact_distinct,
               count(distinct bucket)::bigint as n_occupied
        from s137 group by 1)
      select source, exact_distinct, n_occupied,
             case when n_occupied < $m
               then round($m * ln($m::double / ($m - n_occupied)), 4) end as est,
             case when n_occupied < $m
               then ${Rz(s"""(round($m * ln($m::double / ($m - n_occupied)), 4)
                           - exact_distinct) / exact_distinct""", 4)} end as rel_err
      from a137 order by source
    """
    },
    // c135: c16's regexes rolled up to source grain
    "c135_pii_rate" -> """
      with p135 as (
        select source,
               len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+'))::bigint as e,
               len(regexp_extract_all(text, '[0-9]+'))::bigint as n
        from documents)
      select source, count(*)::bigint as n_docs,
             sum(e)::bigint as n_emails, sum(n)::bigint as n_nums,
             sum(case when e + n > 0 then 1 else 0 end)::bigint as docs_with_pii,
             round(sum(case when e + n > 0 then 1 else 0 end)::double / count(*), 4) as pii_doc_frac,
             round((sum(e) + sum(n))::double / count(*), 4) as hits_per_doc
      from p135 group by source order by source
    """,
    "c78_clustered_recall" -> C78_SQL,

    "c1_dedup_exact" -> """
      select md5(text) as content_hash, count(*) as n_copies, min(doc_id) as keep_doc_id
      from documents group by 1 order by content_hash
    """,

    "c2_dedup_ngram" -> s"""
      with sh as ($SH8),
      keep as (select sh8 from sh group by sh8 having count(*) <= ${graft.operators.Dedup.DfCap}),
      shk as (select sh.* from sh join keep using (sh8)),
      sizes as (select doc_id, count(*) as n_sh from shk group by doc_id),
      inter as (
        select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as n_inter
        from shk a join shk b on a.sh8 = b.sh8 and a.doc_id < b.doc_id
        group by 1, 2)
      select doc_a, doc_b,
             round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) as jaccard
      from inter
      join sizes sa on inter.doc_a = sa.doc_id
      join sizes sb on inter.doc_b = sb.doc_id
      order by jaccard desc, doc_a, doc_b limit 50
    """,

    // c42: same df-capped evidence as c2, asymmetric containment
    // orientation (smaller capped set = doc_in; ties keep doc_a,
    // which is already the lower id); bar compares the ROUNDED value
    "c42_containment" -> s"""
      with sh as ($SH8),
      keep as (select sh8 from sh group by sh8 having count(*) <= ${graft.operators.Dedup.DfCap}),
      shk as (select sh.* from sh join keep using (sh8)),
      sizes as (select doc_id, count(*) as n_sh from shk group by doc_id),
      inter as (
        select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as n_inter
        from shk a join shk b on a.sh8 = b.sh8 and a.doc_id < b.doc_id
        group by 1, 2),
      sc as (
        select case when sa.n_sh <= sb.n_sh then doc_a else doc_b end as doc_in,
               case when sa.n_sh <= sb.n_sh then doc_b else doc_a end as doc_of,
               n_inter,
               round(n_inter / least(sa.n_sh, sb.n_sh), 4) as containment,
               round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) as jaccard
        from inter
        join sizes sa on inter.doc_a = sa.doc_id
        join sizes sb on inter.doc_b = sb.doc_id)
      select * from sc where containment >= ${graft.operators.Dedup.ContainmentBar}
      order by containment desc, doc_in, doc_of limit 50
    """,

    "c3_dedup_minhash" -> s"""
      with $C3_CHAIN
      select doc_a, doc_b, jaccard from vpairs
      order by jaccard desc, doc_a, doc_b limit 50
    """,

    "c12_dup_clusters" -> s"""
      with recursive $C3_CHAIN,
      vp as (select doc_a, doc_b from vpairs where jaccard >= 0.5),
      edges as (
        select doc_a as a, doc_b as b from vp
        union
        select doc_b as a, doc_a as b from vp),
      reach(a, b) as (
        select a, b from edges
        union
        select r.a, e.b from reach r join edges e on r.b = e.a where e.b <> r.a),
      lab as (select a as doc_id, least(a, min(b)) as cluster from reach group by a),
      sizes as (select cluster, count(*) as cluster_size from lab group by cluster)
      select lab.doc_id, lab.cluster, sizes.cluster_size
      from lab join sizes using (cluster)
      order by lab.doc_id
    """,

    "c13_split" -> s"""
      select lang, split, count(*) as n_docs
      from (
        select doc_id, lang,
               case when bucket < $TRAIN then 'train' when bucket < $VAL then 'val' else 'test' end as split
        from (select doc_id, lang,
                ('0x' || substr(md5(doc_id::varchar), 1, 7))::bigint % 100 as bucket
              from documents))
      group by lang, split order by lang, split
    """,

    // seed and shard count interpolated from the operator's constants
    "c28_epoch_shuffle" -> s"""
      with k as (
        select doc_id, md5('${graft.operators.Sampling.ShuffleSeed}' || ':' || doc_id::varchar) as shuffle_key
        from documents),
      s as (
        select doc_id, shuffle_key,
               ('0x' || substr(shuffle_key, 1, 7))::bigint % ${graft.operators.Sampling.ShuffleShards} as shard
        from k)
      select doc_id, shard,
             row_number() over (partition by shard order by shuffle_key) as pos,
             shuffle_key
      from s order by shard, pos
    """,

    "c14_quantize" -> """
      select vec_id,
             round(list_min(embedding)::double, 6) as qmin,
             round(list_max(embedding)::double, 6) as qmax,
             md5(array_to_string(
               list_transform(embedding, x -> case
                 when list_max(embedding)::double = list_min(embedding)::double then 0::bigint
                 else floor((x::double - list_min(embedding)::double)
                      / (list_max(embedding)::double - list_min(embedding)::double)
                      * 255.0 + 0.5)::bigint end::varchar), ',')) as codes_md5
      from embeddings order by vec_id
    """,

    "c4_dedup_simhash" -> s"""
      with toks as (
        select doc_id, w, count(*) as cnt
        from (select doc_id, unnest(string_split(text, ' ')) as w from documents)
        group by doc_id, w),
      th as (select doc_id, cnt, ('0x'||substr(md5(w),1,15))::bigint as h from toks),
      bits as (
        select doc_id, i, sum(case when (h >> i) & 1 = 1 then cnt else -cnt end) as s
        from th, unnest(range(0,60)) as t(i) group by doc_id, i),
      sh as (
        select doc_id, sum(case when s > 0 then (1::bigint << i) else 0::bigint end) as simhash
        from bits group by doc_id),
      chunks as (
        select doc_id, simhash, j, (simhash >> (15*j)) & 32767 as chunk
        from sh, unnest(range(0,4)) as t(j)
        qualify count(*) over (partition by j, chunk) <= $CAP),
      cand as (
        select distinct a.doc_id as doc_a, b.doc_id as doc_b,
               bit_count(xor(a.simhash, b.simhash))::bigint as hamming
        from chunks a join chunks b
          on a.j = b.j and a.chunk = b.chunk and a.doc_id < b.doc_id)
      select doc_a, doc_b, hamming from cand order by hamming, doc_a, doc_b limit 50
    """,

    "c5_embed_neardup" -> s"""
      with $SIGN_BUCKETS
      select a.vec_id as vec_a, b.vec_id as vec_b,
             ${cosN("a.embedding", "b.embedding")} as cos
      from v a join v b on a.bucket = b.bucket and a.vec_id < b.vec_id
      order by cos desc nulls last, vec_a, vec_b limit 50
    """,

    // c12's recursive-reach components over c5's verified pair graph
    // — threshold interpolated from the operator constant
    "c32_semantic_clusters" -> s"""
      with recursive $SIGN_BUCKETS,
      vp as (
        select a.vec_id as va, b.vec_id as vb
        from v a join v b on a.bucket = b.bucket and a.vec_id < b.vec_id
        where ${cosN("a.embedding", "b.embedding")} >= $SEMTH),
      edges as (
        select va as a, vb as b from vp
        union
        select vb as a, va as b from vp),
      reach(a, b) as (
        select a, b from edges
        union
        select r.a, e.b from reach r join edges e on r.b = e.a where e.b <> r.a),
      lab as (select a as vec_id, least(a, min(b)) as cluster from reach group by a)
      select cluster, min(vec_id) as canonical,
             count(*) as n_members, count(*) - 1 as reclaimable
      from lab group by cluster order by cluster
    """,

    // c33's shingle-diagonal span collapse — width / min-span /
    // occurrence-cap interpolated from the operator constants; the
    // pos − row_number() run trick is the same window the operator
    // plans
    "c33_substring_dedup" -> s"""
      with $C33_CHAIN
      select doc_a, doc_b, a_start, b_start, n_tokens from spans
      order by doc_a, doc_b, a_start, b_start
    """,

    // c62: c34's island-merged cut totals left-joined onto the
    // whitespace token counts — uncut docs bill zero
    "c62_eff_tokens" -> s"""
      with $C33_CHAIN,
      iv62 as (select doc_b as doc_id, b_start as s, b_start + n_tokens as e from spans),
      m62 as (
        select doc_id, s, e,
               max(e) over (partition by doc_id order by s, e
                 rows between unbounded preceding and 1 preceding) as maxe
        from iv62),
      isl62 as (
        select doc_id, s, e,
               sum(case when maxe is null or s > maxe then 1 else 0 end)
                 over (partition by doc_id order by s, e) as island
        from m62),
      r62 as (select doc_id, island, min(s) as cs, max(e) as ce
              from isl62 group by doc_id, island),
      cut62 as (select doc_id, sum(ce - cs)::bigint as cut_tokens
                from r62 group by doc_id)
      select d.doc_id, len(string_split(d.text, ' '))::bigint as n_tokens,
             coalesce(cut62.cut_tokens, 0)::bigint as cut_tokens,
             len(string_split(d.text, ' '))::bigint
               - coalesce(cut62.cut_tokens, 0)::bigint as eff_tokens
      from documents d left join cut62 on d.doc_id = cut62.doc_id
      order by d.doc_id
    """,

    // c56: c33's positional-shingle chain with pairs restricted to
    // base×delta (c45's md5 percent cut) and orientation fixed by
    // role — base keeps, delta cuts
    "c56_delta_spans" -> C56_SQL,

    // c67: the gate-store equivalence audit — the at-rest replay of
    // the live funnel's whole batch history (stateless gates per doc,
    // novelty unrolled batch-for-batch), compared at (doc_id, stage,
    // dup_of) grain against what the stream's stores accumulated
    "c67_gate_store" -> c67Sql(graft.streaming.FunnelStream.AuditBatches),

    // c84: the embedding gate's store-grain audit — the live
    // admission history (capped within-batch candidates, cross
    // probes vs accumulated keepers, verified cosine, components,
    // keepers-win) unrolled batch-for-batch
    "c84_embed_gate" -> c84Sql(graft.streaming.EmbedDupStream.EmbedAuditBatches),
    "c157_sketch_gate" -> c157Sql(graft.streaming.EmbedDupStream.EmbedAuditBatches),

    // c85: the five-gate pipeline — the c67 funnel replay probing the
    // FINAL keeper chain, the c84 embedding admission over each
    // batch's lexical keeps, the span tier over the final keeps; every
    // block is the standalone audit's own generator, parameterized
    "c85_gate5" -> c85Sql(graft.streaming.FunnelStream.AuditBatches),
    "c121_gate5_student" -> c121Sql,

    // c77: the four-gate pipeline — c67's replay + the span gate over
    // each batch's admissions, one hash over both stores
    "c77_gate_pipeline" -> c77Sql(graft.streaming.FunnelStream.AuditBatches),

    // c68: the store-backed run must equal the at-rest c56 rebuild —
    // the equality IS the contract, so the oracle is c56's verbatim
    "c68_span_store" -> C56_SQL,

    // c72: the live span gate's accumulated cuts EXECUTED — at-rest
    // replay of the batch history incl. the batch-dependent cap
    "c72_span_exec" -> c72Sql(graft.streaming.SpanStream.SpanAuditBatches),

    // c73: c66's recall grid over the fully trained index (both
    // trainers replayed, per-cluster residual LUTs per cell)
    "c73_trained_recall" -> c73Sql,
    "c80_clustered_trained" -> c80Sql,

    // c75: true iterative BPE training — count, argmax, apply,
    // recount, replayed step-for-step
    "c75_bpe_train" -> c75Sql(graft.operators.TextAnalysis.BpeMerges),

    // c76: c57's encode over the LEARNED list — the per-term symbol
    // counts ARE the training chain's final symbol tables.
    // c83 (stored tokenizer) maps to the SAME SQL: encoding from the
    // persisted merge artifact is DEFINED to equal the in-session
    // learned-list encode, and the hash check proves it.
    "c83_stored_tokenizer" -> C76_SQL,
    "c86_pack_tokenized" -> C86_SQL,
    "c76_bpe_trained_encode" -> C76_SQL,
    "c119_bpe_bytes" -> C119_SQL,
  )

  private lazy val C76_SQL: String = s"""
      with ${c75Chain(graft.operators.TextAnalysis.BpeMerges)},
      nsy76 as (select term, count(*)::bigint as n_syms
                from s${graft.operators.TextAnalysis.BpeMerges} group by term)
      select tf.doc_id, sum(tf.tf)::bigint as n_words,
             sum(tf.tf * length(tf.term))::bigint as n_chars,
             sum(tf.tf * coalesce(nsy76.n_syms, 0))::bigint as n_bpe_tokens,
             case when sum(tf.tf * length(tf.term)) > 0
               then round(sum(tf.tf * coalesce(nsy76.n_syms, 0))::double
                          / sum(tf.tf * length(tf.term)), 4) end as compression
      from tf75 tf left join nsy76 on tf.term = nsy76.term
      group by tf.doc_id order by tf.doc_id
    """

  /** c119: C76's trained-encode replay at BYTE grain — the same
    * count-pick-apply training chain with s0 split into lowercase
    * hex UTF-8 byte symbols (the operator's ByteGrain.symbols
    * spelling: DuckDB's hex() over the term's UTF-8 bytes) and the
    * compression mass priced in BYTES (strlen, Spark's
    * octet_length). Merged symbols concatenate hex pairs, so the
    * symbol tables stay plain strings under the same binary
    * tie-break order both engines share. */
  private lazy val C119_SQL: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    s"""
      with ${c75Chain(m, byteGrain = true)},
      nsy119 as (select term, count(*)::bigint as n_syms
                 from s$m group by term)
      select tf.doc_id, sum(tf.tf)::bigint as n_words,
             sum(tf.tf * strlen(tf.term))::bigint as n_chars,
             sum(tf.tf * coalesce(nsy119.n_syms, 0))::bigint as n_bpe_tokens,
             case when sum(tf.tf * strlen(tf.term)) > 0
               then round(sum(tf.tf * coalesce(nsy119.n_syms, 0))::double
                          / sum(tf.tf * strlen(tf.term)), 4) end as compression
      from tf75 tf left join nsy119 on tf.term = nsy119.term
      group by tf.doc_id order by tf.doc_id
    """
  }

  /** c163: the byte-grain chain with the pair WEIGHTS restricted to
    * the deterministic md5-bucket training sample (c13's percent-cut
    * spelling) — the symbol tables still span the whole vocabulary,
    * so the learned merges price every doc; the report is c119's
    * per-doc table over the FULL corpus. */
  private lazy val C163_SQL: String = {
    val m = graft.operators.TextAnalysis.BpeMerges
    val pct = graft.operators.TextAnalysis.BpeSampleTrainPct
    val pred = s"('0x' || substr(md5(doc_id::varchar), 1, 7))::bigint % 100 < $pct"
    s"""
      with ${c75Chain(m, byteGrain = true, trainPred = pred)},
      nsy163 as (select term, count(*)::bigint as n_syms
                 from s$m group by term)
      select tf.doc_id, sum(tf.tf)::bigint as n_words,
             sum(tf.tf * strlen(tf.term))::bigint as n_chars,
             sum(tf.tf * coalesce(nsy163.n_syms, 0))::bigint as n_bpe_tokens,
             case when sum(tf.tf * strlen(tf.term)) > 0
               then round(sum(tf.tf * coalesce(nsy163.n_syms, 0))::double
                          / sum(tf.tf * strlen(tf.term)), 4) end as compression
      from tf75 tf left join nsy163 on tf.term = nsy163.term
      group by tf.doc_id order by tf.doc_id
    """
  }

  // c86: c76's trained-encode chain producing the per-doc BPE token
  // counts, then c22's packing window verbatim over those counts —
  // the two composed oracles are the standalone queries' own SQL
  private lazy val C86_SQL: String = s"""
      with ${c75Chain(graft.operators.TextAnalysis.BpeMerges)},
      nsy86 as (select term, count(*)::bigint as n_syms
                from s${graft.operators.TextAnalysis.BpeMerges} group by term),
      enc86 as (
        select tf.doc_id,
               sum(tf.tf * coalesce(nsy86.n_syms, 0))::bigint as n_tok
        from tf75 tf left join nsy86 on tf.term = nsy86.term
        group by tf.doc_id),
      d86 as (select doc_id, doc_id % $SHARDS as shard, n_tok from enc86),
      c86 as (
        select doc_id, shard, n_tok,
               sum(n_tok) over (partition by shard order by doc_id
                 rows between unbounded preceding and current row)::bigint as cum
        from d86)
      select shard, ((cum - n_tok) // $BUDGET)::bigint as seq_id,
             count(*) as n_docs, sum(n_tok)::bigint as sum_tok,
             min(doc_id) as first_doc, max(doc_id) as last_doc
      from c86 group by 1, 2 order by shard, seq_id
    """

  private lazy val sql2: Map[String, String] = Map(
    // c34's island merge over c33's b-side intervals — the running
    // max uses a strict ROWS frame, the island id the default RANGE
    // cumulative frame; tied intervals share an island in both
    // engines
    "c34_span_cuts" -> s"""
      with $C33_CHAIN,
      iv as (select doc_b as doc_id, b_start as s, b_start + n_tokens as e from spans),
      m as (
        select doc_id, s, e,
               max(e) over (partition by doc_id order by s, e
                 rows between unbounded preceding and 1 preceding) as maxe
        from iv),
      isl as (
        select doc_id, s, e,
               sum(case when maxe is null or s > maxe then 1 else 0 end)
                 over (partition by doc_id order by s, e) as island
        from m),
      r as (select doc_id, island, min(s) as cs, max(e) as ce from isl group by doc_id, island)
      select doc_id, count(*) as n_cut_ranges, sum(ce - cs)::bigint as cut_tokens
      from r group by doc_id order by doc_id
    """,

    "c6_ann_topk" -> s"""
      with q as (select vec_id as q_id, embedding as q_emb from embeddings where vec_id < $NQ),
      scored as (
        select q.q_id, e.vec_id,
               ${cosN("q.q_emb", "e.embedding")} as cos
        from embeddings e cross join q
        where e.vec_id <> q.q_id),
      ranked as (
        select q_id, vec_id, cos,
               row_number() over (partition by q_id order by cos desc nulls last, vec_id)::bigint as rank
        from scored)
      select q_id, vec_id, cos, rank from ranked where rank <= 10 order by q_id, rank
    """,

    "c7_ann_ivf" -> s"""
      with c as (select vec_id as c_id, embedding as c_emb from embeddings where vec_id < $NC),
      ranked_assign as (
        select e.vec_id, e.embedding, c.c_id,
               row_number() over (partition by e.vec_id
                 order by ${cosN("e.embedding", "c.c_emb")} desc nulls last, c.c_id) as rn
        from embeddings e cross join c),
      assigned as (select vec_id, embedding, c_id as cluster from ranked_assign where rn = 1),
      probes as (select vec_id as q_id, embedding as q_emb, c_id as cluster
                 from ranked_assign where vec_id < $NQ and rn <= $NPROBE),
      ranked as (
        select p.q_id, a.vec_id, a.cluster,
               ${cosN("p.q_emb", "a.embedding")} as cos,
               row_number() over (partition by p.q_id
                 order by ${cosN("p.q_emb", "a.embedding")} desc nulls last, a.vec_id)::bigint as rank
        from assigned a join probes p on a.cluster = p.cluster
        where a.vec_id <> p.q_id)
      select q_id, vec_id, cluster, cos, rank from ranked where rank <= 10 order by q_id, rank
    """,

    "c26_ann_ivf_trained" -> s"""
      with $TRAINED_CENTROIDS,
      c as (select c_id, c_emb from cent$QITERS),
      ranked_assign as (
        select e.vec_id, e.embedding, c.c_id,
               row_number() over (partition by e.vec_id
                 order by ${cosN("e.embedding", "c.c_emb")} desc nulls last, c.c_id) as rn
        from embeddings e cross join c),
      assigned as (select vec_id, embedding, c_id as cluster from ranked_assign where rn = 1),
      probes as (select vec_id as q_id, embedding as q_emb, c_id as cluster
                 from ranked_assign where vec_id < $NQ and rn <= $NPROBE),
      ranked as (
        select p.q_id, a.vec_id, a.cluster,
               ${cosN("p.q_emb", "a.embedding")} as cos,
               row_number() over (partition by p.q_id
                 order by ${cosN("p.q_emb", "a.embedding")} desc nulls last, a.vec_id)::bigint as rank
        from assigned a join probes p on a.cluster = p.cluster
        where a.vec_id <> p.q_id)
      select q_id, vec_id, cluster, cos, rank from ranked where rank <= 10 order by q_id, rank
    """,

    "c8_langid" -> s"""
      select doc_id, labeled_lang, n_tokens, en_hits, en_score, en_ngram_score,
             case when en_score > 0.01 or en_ngram_score > 0.02 then 'en' else 'und' end as pred_lang
      from (
        select doc_id, lang as labeled_lang,
               len(w)::bigint as n_tokens,
               len(list_filter(w, t -> list_contains($markers, t)))::bigint as en_hits,
               round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) as en_score,
               round((
                 (length(text) - length(replace(text, 'th', ''))) / 2
               + (length(text) - length(replace(text, 'he', ''))) / 2
               + (length(text) - length(replace(text, 'in', ''))) / 2
               + (length(text) - length(replace(text, 'er', ''))) / 2
               )::double / length(text), 4) as en_ngram_score
        from (select doc_id, lang, text, string_split(text, ' ') as w from documents))
      order by doc_id
    """,

    "c9_quality" -> s"""
      select doc_id, n_chars, n_tokens, distinct_ratio, stopword_ratio, punct_ratio, chars_per_token,
             round(0.3 * least(n_tokens::double / 100.0, 1.0)
                 + 0.4 * distinct_ratio
                 + 0.3 * least(stopword_ratio * 5.0, 1.0), 5) as quality
      from (
        select doc_id, n_chars::bigint as n_chars,
               len(w)::bigint as n_tokens,
               round(len(list_distinct(w))::double / len(w), 4) as distinct_ratio,
               round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) as stopword_ratio,
               round(len(regexp_extract_all(text, '[^a-z0-9 ]'))::double / n_chars, 4) as punct_ratio,
               round(n_chars::double / len(w), 4) as chars_per_token
        from (select doc_id, n_chars, text, string_split(text, ' ') as w from documents))
      order by doc_id
    """,

    "c10_token_count" -> """
      select doc_id,
             len(string_split(text, ' '))::bigint as ws_tokens,
             len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::bigint as bpe_tokens,
             length(text)::bigint as len_chars
      from documents order by doc_id
    """,

    "c15_normalize" -> """
      select doc_id, length(text)::bigint as len_raw,
             length(norm)::bigint as len_norm,
             norm <> text as changed,
             md5(norm) as norm_md5
      from (select doc_id, text,
              trim(regexp_replace(regexp_replace(text, '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) as norm
            from documents)
      order by doc_id
    """,

    "c16_pii_redact" -> """
      select doc_id,
             len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+'))::bigint as n_emails,
             len(regexp_extract_all(text, '[0-9]+'))::bigint as n_nums,
             length(red)::bigint as len_redacted,
             md5(red) as redacted_md5
      from (select doc_id, text,
              regexp_replace(regexp_replace(text, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                '[0-9]+', '<NUM>', 'g') as red
            from documents)
      order by doc_id
    """,

    "c17_tfidf" -> """
      with terms as (select doc_id, unnest(string_split(text, ' ')) as term from documents),
      tf as (select doc_id, term, count(*) as tf from terms group by 1, 2),
      df as (select term, count(*) as df
             from (select distinct doc_id, term from terms) group by term),
      n as (select count(*) as n_docs from documents),
      scored as (
        select doc_id, term, tf, df,
               round(tf * ln(n_docs::double / df), 4) as tfidf
        from tf join df using (term) cross join n),
      ranked as (
        select *, row_number() over (partition by doc_id order by tfidf desc, term)::bigint as rank
        from scored)
      select doc_id, term, tf, df, tfidf, rank from ranked
      where rank <= 3 order by doc_id, rank
    """,

    "c18_stratified" -> s"""
      select lang, count(*) as n_total,
             count(*) filter (where kept) as n_kept,
             min(doc_id) filter (where kept) as min_kept_id,
             max(doc_id) filter (where kept) as max_kept_id,
             round((count(*) filter (where kept))::double / count(*), 4) as kept_frac
      from (select doc_id, lang,
              ('0x' || substr(md5(doc_id::varchar), 1, 7))::bigint % 1000
                < ($KEEP_MILLE) as kept
            from documents)
      group by lang order by lang
    """,

    "c20_contamination" -> s"""
      with sh as ($SH8),
      bench as (select distinct sh8 from sh where doc_id % 97 = 0),
      scored as (
        select sh.doc_id, count(*) as n_sh,
               count(bench.sh8) as n_hit
        from sh left join bench on sh.sh8 = bench.sh8
        where sh.doc_id % 97 <> 0
        group by sh.doc_id)
      select doc_id, n_sh, n_hit,
             round(n_hit::double / n_sh, 4) as contamination
      from scored
      order by contamination desc, doc_id limit 50
    """,

    "c35_bloom_contamination" -> s"""
      with shs as (
        select doc_id, s, substr(md5(s), 1, 8) as sh8
        from (select distinct doc_id, s from ($SHINGLES))),
      bench as (select distinct sh8 from shs where doc_id % 97 = 0),
      bits as (
        select distinct ('0x' || substr(md5(sh8), 1 + 7*i, 7))::bigint % $BLOOM_M as pos
        from bench, unnest(range(0,$BLOOM_K)) as t(i)),
      probe as (
        select doc_id, s,
               ('0x' || substr(md5(sh8), 1 + 7*i, 7))::bigint % $BLOOM_M as pos
        from shs, unnest(range(0,$BLOOM_K)) as t(i)
        where doc_id % 97 <> 0),
      -- grouped by the RAW shingle (not sh8): the Spark probe counts
      -- one row per distinct raw shingle, so an in-doc h8 collision
      -- contributes TWO rows on both sides
      per_sh as (
        select probe.doc_id, probe.s,
               count(*) as n_pos, count(bits.pos) as n_hit
        from probe left join bits on probe.pos = bits.pos
        group by probe.doc_id, probe.s)
      select doc_id, count(*) as n_sh,
             (count(*) filter (where n_hit = n_pos))::bigint as n_flagged,
             round((count(*) filter (where n_hit = n_pos))::double / count(*), 4) as flagged_frac
      from per_sh group by doc_id
      order by flagged_frac desc, doc_id limit 50
    """,

    "c36_cluster_split" -> s"""
      with recursive $C3_CHAIN,
      vp as (select doc_a, doc_b from vpairs where jaccard >= 0.5),
      edges as (
        select doc_a as a, doc_b as b from vp
        union
        select doc_b as a, doc_a as b from vp),
      reach(a, b) as (
        select a, b from edges
        union
        select r.a, e.b from reach r join edges e on r.b = e.a where e.b <> r.a),
      lab as (select a as doc_id, least(a, min(b)) as cluster from reach group by a),
      cl as (
        select d.doc_id, coalesce(lab.cluster, d.doc_id) as cluster
        from documents d left join lab on d.doc_id = lab.doc_id),
      s as (
        select doc_id, cluster,
               case when b < $TRAIN then 'train' when b < $VAL then 'val' else 'test' end as split
        from (select doc_id, cluster,
                ('0x' || substr(md5(cluster::varchar), 1, 7))::bigint % 100 as b
              from cl))
      select split, count(*) as n_docs, count(distinct cluster) as n_clusters
      from s group by split order by split
    """,

    "c37_bm25" -> s"""
      with q as (
        select doc_id as q_id, unnest(list_distinct(w[1:$QTOK])) as term
        from (select doc_id, string_split(text, ' ') as w
              from documents where doc_id % 101 = 0)),
      terms as (
        select doc_id, unnest(string_split(text, ' ')) as term
        from documents where doc_id % 101 <> 0),
      tf as (select doc_id, term, count(*) as tf from terms group by 1, 2),
      dl as (select doc_id, sum(tf)::bigint as dl from tf group by 1),
      stats as (select sum(dl)::double / count(*) as avgdl, count(*) as n_docs from dl),
      dfx as (select term, count(*) as df from tf group by 1),
      capped as (select term, df from dfx, stats where df * 10 <= n_docs * 9),
      pruned as (
        select term, doc_id, tf from tf
        qualify row_number() over (partition by term
          order by tf desc, doc_id) <= $PCAP),
      contrib as (
        select q.q_id, p.doc_id,
               ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                 * (tf::double * $K1P1)
                 / (tf + $K1 * ($OMB + $B25 * dl / avgdl)) as c
        from q
        join pruned p using (term)
        join capped using (term)
        join dl on p.doc_id = dl.doc_id, stats),
      scored as (select q_id, doc_id, round(sum(c), 4) as score from contrib group by 1, 2),
      ranked as (
        select q_id, doc_id, score,
               row_number() over (partition by q_id order by score desc, doc_id) as rank
        from scored)
      select q_id, rank, doc_id, score from ranked
      where rank <= $BMTOPK order by q_id, rank
    """,

    "c38_temperature_mix" -> s"""
      with counts as (select source, count(*) as n_total from documents group by source),
      tot as (
        select sum(n_total)::bigint as n_corpus,
               round(sum(sqrt(n_total)), 6) as z
        from counts),
      rates as (
        select source,
               least(1000, floor(1000.0 * floor(n_corpus * $MIXSHARE)
                 * sqrt(n_total) / (z * n_total))::bigint) as mille
        from counts, tot),
      d as (
        select doc_id, source,
               ('0x' || substr(md5(doc_id::varchar), 1, 7))::bigint % 1000 as bucket
        from documents)
      select d.source, count(*) as n_docs, min(mille) as keep_mille,
             (count(*) filter (where bucket < mille))::bigint as n_kept,
             round((count(*) filter (where bucket < mille))::double / count(*), 4) as kept_frac
      from d join rates on d.source = rates.source
      group by d.source order by d.source
    """,

    // c61: c8's language verdict keys c38's p ∝ √n admission at
    // (pred_lang, source) grain — both spellings verbatim
    "c61_lang_mix" -> s"""
      with pl as (
        select doc_id, source,
               case when round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) > 0.01
                      or round((
                        (length(text) - length(replace(text, 'th', ''))) / 2
                      + (length(text) - length(replace(text, 'he', ''))) / 2
                      + (length(text) - length(replace(text, 'in', ''))) / 2
                      + (length(text) - length(replace(text, 'er', ''))) / 2
                        )::double / length(text), 4) > 0.02
                 then 'en' else 'und' end as pred_lang
        from (select doc_id, source, text, string_split(text, ' ') as w from documents)),
      counts as (select pred_lang, source, count(*) as n_total from pl group by 1, 2),
      tot as (
        select sum(n_total)::bigint as n_corpus,
               round(sum(sqrt(n_total)), 6) as z
        from counts),
      rates as (
        select pred_lang, source,
               least(1000, floor(1000.0 * floor(n_corpus * $MIXSHARE)
                 * sqrt(n_total) / (z * n_total))::bigint) as mille
        from counts, tot),
      d as (
        select pred_lang, source,
               ('0x' || substr(md5(doc_id::varchar), 1, 7))::bigint % 1000 as bucket
        from pl)
      select d.pred_lang, d.source, count(*) as n_docs, min(mille) as keep_mille,
             (count(*) filter (where bucket < mille))::bigint as n_kept,
             round((count(*) filter (where bucket < mille))::double / count(*), 4) as kept_frac
      from d join rates on d.pred_lang = rates.pred_lang and d.source = rates.source
      group by d.pred_lang, d.source
      order by d.pred_lang, d.source
    """,

    // c41: the Gopher §A1.1 battery at (doc, term) grain — thresholds
    // interpolated from the operator constants; rules compare the
    // ROUNDED signals (round-then-compare, c17's discipline); the //3
    // is exact (replace removes whole '...' occurrences)
    "c41_gopher_rules" -> s"""
      with tf as materialized (
        select doc_id, term, count(*)::bigint as tf
        from (select doc_id, unnest(string_split(text, ' ')) as term from documents)
        group by 1, 2),
      sig as materialized (
        select doc_id,
               sum(tf)::bigint as n_words,
               round(sum(tf * length(term))::double / sum(tf), 4) as mean_word_len,
               round(sum(case when regexp_matches(term, '^[a-z]+$$') then tf else 0 end)::double
                     / sum(tf), 4) as alpha_frac,
               round(sum(tf * ((length(term) - length(replace(term, '#', '')))
                               + (length(term) - length(replace(term, '...', ''))) // 3))::double
                     / sum(tf), 4) as symbol_ratio,
               sum(case when list_contains($markers, term) then tf else 0 end)::bigint as stop_hits
        from tf group by doc_id)
      select doc_id, n_words, mean_word_len, alpha_frac, symbol_ratio, stop_hits,
             (case when fail_reasons = '' then 1 else 0 end)::bigint as keep, fail_reasons
      from (
        select *,
               concat_ws(',',
                 case when n_words < ${graft.operators.TextAnalysis.GopherMinWords}
                        or n_words > ${graft.operators.TextAnalysis.GopherMaxWords}
                      then 'word_count' end,
                 case when mean_word_len < ${graft.operators.TextAnalysis.GopherMinMeanLen}
                        or mean_word_len > ${graft.operators.TextAnalysis.GopherMaxMeanLen}
                      then 'mean_word_len' end,
                 case when alpha_frac < ${graft.operators.TextAnalysis.GopherMinAlphaFrac}
                      then 'alpha' end,
                 case when symbol_ratio > ${graft.operators.TextAnalysis.GopherMaxSymbolRatio}
                      then 'symbol' end,
                 case when stop_hits < ${graft.operators.TextAnalysis.GopherMinStopHits}
                      then 'stopword' end) as fail_reasons
        from sig)
      order by doc_id
    """,

    // c58: c31's scoring chain + the CCNet per-source ntile cut;
    // bucket count interpolated from the operator constant
    "c58_ppl_buckets" -> s"""
      with tf as (
        select doc_id, term, count(*) as tf
        from (select doc_id, unnest(string_split(text, ' ')) as term from documents)
        group by 1, 2),
      uni as (select term, sum(tf)::bigint as cnt from tf group by term),
      tot as (select sum(cnt)::bigint as n_total from uni),
      sc as (
        select doc_id, sum(tf)::bigint as n_tokens,
               ${Rz("sum(tf::double * log10(cnt::double / n_total)) / sum(tf)", 4)} as mean_logprob
        from tf join uni using (term), tot
        group by doc_id),
      b as (
        select sc.doc_id, d.source, sc.n_tokens, sc.mean_logprob,
               ntile(${graft.operators.TextAnalysis.PplBuckets}) over (
                 partition by d.source order by sc.mean_logprob desc, sc.doc_id)::bigint as bucket
        from sc join documents d on sc.doc_id = d.doc_id)
      select source, bucket, count(*) as n_docs, sum(n_tokens)::bigint as sum_tokens,
             min(mean_logprob) as min_logprob, max(mean_logprob) as max_logprob
      from b group by source, bucket
      order by source, bucket
    """,

    // c59: df over the shared shingle spelling, unique-share per doc
    "c59_novelty" -> s"""
      with sh as ($SH8),
      dfq as (select sh8, count(*) as df from sh group by sh8)
      select sh.doc_id, count(*) as n_sh,
             sum(case when df = 1 then 1 else 0 end)::bigint as n_unique,
             round(sum(case when df = 1 then 1 else 0 end)::double / count(*), 4) as novelty
      from sh join dfq using (sh8)
      group by sh.doc_id
      order by doc_id
    """,

    // c57: c40's ranked merge list applied greedily, CTE-for-CTE —
    // one generated block per merge (see bpeStep); doc counts reduce
    // off the same tf table under the learned segmentation
    // c63: per-budget aggregates off the SAME symbol tables the c57
    // chain materializes (s0, s2, …) — budgets interpolated
    "c63_bpe_sweep" -> s"""
      with $BPE_CHAIN,
      ${graft.operators.TextAnalysis.BpeSweepBudgets.map(b =>
        s"""nb$b as (select term, count(*)::bigint as n_syms from s$b group by term)""")
        .mkString(",")}
      ${graft.operators.TextAnalysis.BpeSweepBudgets.map(b => s"""
      select $b::bigint as budget,
             sum(tf.tf * coalesce(nb.n_syms, 0))::bigint as n_units,
             sum(tf.tf * length(tf.term))::bigint as n_chars,
             case when sum(tf.tf * length(tf.term)) > 0
               then round(sum(tf.tf * coalesce(nb.n_syms, 0))::double
                          / sum(tf.tf * length(tf.term)), 4) end as compression
      from tf left join nb$b nb on tf.term = nb.term""").mkString("\n      union all")}
      order by budget
    """,

    "c57_bpe_encode" -> s"""
      with $BPE_CHAIN,
      nsy as (select term, count(*)::bigint as n_syms
              from s${graft.operators.TextAnalysis.BpeMerges} group by term)
      select tf.doc_id, sum(tf.tf)::bigint as n_words,
             sum(tf.tf * length(tf.term))::bigint as n_chars,
             sum(tf.tf * coalesce(nsy.n_syms, 0))::bigint as n_bpe_tokens,
             case when sum(tf.tf * length(tf.term)) > 0
               then round(sum(tf.tf * coalesce(nsy.n_syms, 0))::double
                          / sum(tf.tf * length(tf.term)), 4) end as compression
      from tf left join nsy on tf.term = nsy.term
      group by tf.doc_id order by tf.doc_id
    """,

    "c40_bpe_pairs" -> """
      with tf as (
        select doc_id, term, count(*) as tf
        from (select doc_id, unnest(string_split(text, ' ')) as term from documents)
        group by 1, 2),
      words as (select term, sum(tf)::bigint as n from tf group by term),
      pairs as (
        select term, n, substr(term, i::int, 2) as pair
        from words, unnest(range(1, length(term))) as t(i)
        where length(term) >= 2)
      select pair, sum(n)::bigint as total, count(distinct term) as n_words
      from pairs group by pair
      order by total desc, pair limit 50
    """,

    "c39_dsir" -> s"""
      with tf as (
        select doc_id, term, count(*) as tf
        from (select doc_id, unnest(string_split(text, ' ')) as term from documents)
        group by 1, 2),
      tgt as (select term, sum(tf)::bigint as c_tgt from tf where doc_id % 97 = 0 group by 1),
      rawu as (select term, sum(tf)::bigint as c_raw from tf where doc_id % 97 <> 0 group by 1),
      vocab as (
        select coalesce(tgt.term, rawu.term) as term,
               coalesce(c_tgt, 0) as c_tgt, coalesce(c_raw, 0) as c_raw
        from tgt full join rawu on tgt.term = rawu.term),
      tot as (select sum(c_tgt)::bigint as n_tgt, sum(c_raw)::bigint as n_raw,
                     count(*) as v from vocab)
      select tf.doc_id, sum(tf)::bigint as n_tokens,
             ${Rz("""sum(tf::double * (log10((c_tgt+1)::double / (n_tgt+v))
                                   - log10((c_raw+1)::double / (n_raw+v)))) / sum(tf)""",
                  4)} as mean_llr
      from tf join vocab using (term), tot
      where tf.doc_id % 97 <> 0
      group by tf.doc_id
      order by mean_llr desc, doc_id limit 50
    """,

    "c21_repetition" -> """
      with b as (
        select doc_id, unnest([w[i]||' '||w[i+1] for i in range(1, len(w))]) as bigram
        from (select doc_id, string_split(text, ' ') as w from documents)),
      c as (select doc_id, bigram, count(*) as cnt from b group by 1, 2),
      t as (
        select doc_id, bigram, cnt,
               sum(cnt) over (partition by doc_id) as total,
               row_number() over (partition by doc_id order by cnt desc, bigram) as rn
        from c)
      select doc_id, total::bigint as n_bigrams, cnt as max_rep, bigram as top_bigram,
             round(cnt::double / total, 4) as rep_ratio
      from t where rn = 1 order by doc_id
    """,

    "c22_seq_pack" -> s"""
      with d as (
        select doc_id, doc_id % $SHARDS as shard,
               len(string_split(text, ' '))::bigint as n_tok
        from documents),
      c as (
        select doc_id, shard, n_tok,
               sum(n_tok) over (partition by shard order by doc_id
                 rows between unbounded preceding and current row)::bigint as cum
        from d)
      select shard, ((cum - n_tok) // $BUDGET)::bigint as seq_id,
             count(*) as n_docs, sum(n_tok)::bigint as sum_tok,
             min(doc_id) as first_doc, max(doc_id) as last_doc
      from c group by 1, 2 order by shard, seq_id
    """,

    "c19_ngram_stats" -> """
      with t as (
        select doc_id, unnest([w[i]||' '||w[i+1] for i in range(1, len(w))]) as bigram
        from (select doc_id, string_split(text, ' ') as w from documents))
      select bigram, count(*) as n, count(distinct doc_id) as n_docs
      from t group by bigram
      order by n desc, bigram limit 50
    """,

    "c23_curation" -> s"""
      with sig as (
        select doc_id,
               len(w) as n_tokens,
               round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) as en_score,
               round(((length(text) - length(replace(text, 'th', ''))) / 2
                    + (length(text) - length(replace(text, 'he', ''))) / 2
                    + (length(text) - length(replace(text, 'in', ''))) / 2
                    + (length(text) - length(replace(text, 'er', ''))) / 2
                     )::double / length(text), 4) as en_ngram_score,
               round(len(list_distinct(w))::double / len(w), 4) as distinct_ratio,
               len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+'))
                 + len(regexp_extract_all(text, '[0-9]+')) as n_pii
        from (select doc_id, text, string_split(text, ' ') as w from documents)),
      r as (
        select case when n_tokens < 5 then 'too_short'
                    when not (en_score > 0.01 or en_ngram_score > 0.02) then 'non_en'
                    when distinct_ratio < 0.3 then 'repetitive'
                    when n_pii > 20 then 'pii_heavy'
                    else 'keep' end as reason
        from sig),
      t as (select count(*) as total from documents)
      select reason, count(*) as n_docs,
             round(count(*)::double / t.total, 4) as share
      from r, t group by reason, t.total order by reason
    """,

    "c25_doc_chunks" -> s"""
      with d as (select doc_id, string_split(text, ' ') as w from documents),
      x as (
        select doc_id, w,
               unnest(range(0, greatest(ceil((len(w) - ${CSZ - CST})::double / $CST)::bigint, 1))) as chunk_idx
        from d)
      select doc_id, chunk_idx::bigint as chunk_idx,
             len(w[(chunk_idx*$CST+1)::int : (chunk_idx*$CST+$CSZ)::int])::bigint as n_tok,
             md5(array_to_string(w[(chunk_idx*$CST+1)::int : (chunk_idx*$CST+$CSZ)::int], ' ')) as chunk_md5
      from x order by doc_id, chunk_idx
    """,

    // c27 = c25's chunk spelling feeding c23's signal spelling, both
    // verbatim — chunk text reassembles with single spaces, so
    // re-splitting it equals the token slice
    "c27_chunk_curation" -> s"""
      with d as (select doc_id, string_split(text, ' ') as w from documents),
      x as (
        select doc_id, w,
               unnest(range(0, greatest(ceil((len(w) - ${CSZ - CST})::double / $CST)::bigint, 1))) as chunk_idx
        from d),
      ch as (
        select array_to_string(w[(chunk_idx*$CST+1)::int : (chunk_idx*$CST+$CSZ)::int], ' ') as text
        from x),
      sig as (
        select len(w) as n_tokens,
               round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) as en_score,
               round(((length(text) - length(replace(text, 'th', ''))) / 2
                    + (length(text) - length(replace(text, 'he', ''))) / 2
                    + (length(text) - length(replace(text, 'in', ''))) / 2
                    + (length(text) - length(replace(text, 'er', ''))) / 2
                     )::double / length(text), 4) as en_ngram_score,
               round(len(list_distinct(w))::double / len(w), 4) as distinct_ratio,
               len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+'))
                 + len(regexp_extract_all(text, '[0-9]+')) as n_pii
        from (select text, string_split(text, ' ') as w from ch)),
      r as (
        select case when n_tokens < 5 then 'too_short'
                    when not (en_score > 0.01 or en_ngram_score > 0.02) then 'non_en'
                    when distinct_ratio < 0.3 then 'repetitive'
                    when n_pii > 20 then 'pii_heavy'
                    else 'keep' end as reason
        from sig),
      t as (select count(*) as total from ch)
      select reason, count(*) as n_chunks,
             round(count(*)::double / t.total, 4) as share
      from r, t group by reason, t.total order by reason
    """,

    "c29_quality_bins" -> s"""
      with q as (
        select source, doc_id, len(w)::bigint as n_tok,
               round(0.3 * least(len(w)::double / 100.0, 1.0)
                   + 0.4 * round(len(list_distinct(w))::double / len(w), 4)
                   + 0.3 * least(round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) * 5.0, 1.0), 5) as quality
        from (select source, doc_id, string_split(text, ' ') as w from documents)),
      b as (
        select source, n_tok, quality,
               ntile(${graft.operators.TextAnalysis.QualityBins})
                 over (partition by source order by quality, doc_id) as bin
        from q)
      select source, bin::bigint as bin, count(*) as n_docs,
             min(quality) as min_q, max(quality) as max_q,
             sum(n_tok)::bigint as sum_tok
      from b group by source, bin order by source, bin
    """,

    "c30_source_mixture" -> s"""
      with d as (
        select source, doc_id,
               len(string_split(text, ' '))::bigint as n_tok,
               md5(doc_id::varchar) as prio,
               case ${graft.operators.TextAnalysis.MixtureBudgets.toSeq.sortBy(_._1)
                  .map { case (s, b) => s"when source = '$s' then ${b}" }.mkString(" ")}
                    else ${graft.operators.TextAnalysis.DefaultMixtureBudget} end as budget
        from documents),
      c as (
        select source, n_tok, budget,
               sum(n_tok) over (partition by source order by prio, doc_id
                 rows between unbounded preceding and current row) as cum
        from d)
      select source, count(*) as n_docs,
             sum(case when cum - n_tok < budget then 1 else 0 end)::bigint as n_kept,
             sum(case when cum - n_tok < budget then n_tok else 0 end)::bigint as kept_tok,
             max(budget)::bigint as budget,
             round(sum(case when cum - n_tok < budget then n_tok else 0 end)::double
                   / max(budget), 4) as fill_rate
      from c group by source order by source
    """,

    "c31_unigram_logprob" -> s"""
      with terms as (select doc_id, unnest(string_split(text, ' ')) as term from documents),
      tf as (select doc_id, term, count(*) as tf from terms group by 1, 2),
      uni as (select term, sum(tf)::bigint as cnt from tf group by term),
      tot as (select sum(cnt)::bigint as n_total from uni)
      select doc_id, sum(tf)::bigint as n_tokens, count(*) as n_terms,
             ${Rz("sum(tf::double * log10(cnt::double / n_total)) / sum(tf)", 4)} as mean_logprob
      from tf join uni using (term), tot
      group by doc_id order by doc_id
    """,

    // c43: c5's bucket CTE + both pair directions + a k-bounded rank
    // window — knn depth interpolated from the operator constant
    "c43_knn_graph" -> s"""
      with $SIGN_BUCKETS,
      p as (
        select * from (
          select a.vec_id as va, b.vec_id as vb,
                 round(${cosine("a.embedding", "b.embedding")}, 4) as cos
          from v a join v b on a.bucket = b.bucket and a.vec_id < b.vec_id)
        -- no-evidence pairs never rank (zero-norm cosine is NULL,
        -- NaN elements make it NaN — which is NOT null in either
        -- engine): the operator's full stance, mirrored so neither a
        -- zero-norm nor a NaN-element corpus can diverge
        where cos is not null and not isnan(cos)),
      e as (select va as vec_id, vb as nbr, cos from p
            union all
            select vb as vec_id, va as nbr, cos from p),
      r as (select vec_id, nbr, cos,
                   row_number() over (partition by vec_id order by cos desc, nbr)::bigint as rank
            from e)
      select vec_id, rank, nbr, cos from r
      where rank <= ${graft.operators.Similarity.KnnK}
      order by vec_id, rank
    """,

    // c47: PQ geometry interpolated from the operator constants; the
    // lut reuses the vd frame (same cell math the operator computes
    // twice by symmetry); per-cell round-then-argmin / round-then-sum
    // is the operator's determinism contract
    "c47_pq_adc" -> s"""
      with $C47_CHAIN
      select q_id, rank, vec_id, adist from r47
      where rank <= ${graft.operators.Similarity.PqTopK}
      order by q_id, rank
    """,

    // c60: c7's assignment/probe ranking composed with c47's PQ
    // cells — ADC restricted to (query, probed-cluster) members
    "c60_ivf_pq" -> s"""
      with $C47_CELLS,
      cc as (select vec_id as c_id, embedding as c_emb from embeddings where vec_id < $NC),
      -- no-evidence cosines (zero norm → 0/0 = NaN in DuckDB, NaN
      -- elements likewise) rank LAST, mirroring the kernel's stance
      ranked_assign as (
        select e.vec_id, cc.c_id,
               row_number() over (partition by e.vec_id
                 order by ${cosN("e.embedding", "cc.c_emb")} desc nulls last, cc.c_id) as rn
        from embeddings e cross join cc),
      assigned60 as (select vec_id, c_id as cluster from ranked_assign where rn = 1),
      probes60 as (select vec_id as q_id, c_id as cluster
                   from ranked_assign where vec_id < $NQ and rn <= $NPROBE),
      sc60 as (
        select l.q_id, c.vec_id, round(sum(l.d2), 4) as adist
        from codes c
        join assigned60 a on a.vec_id = c.vec_id
        join probes60 p on p.cluster = a.cluster
        join lut l on l.q_id = p.q_id and l.m = c.m and l.k = c.code
        where c.vec_id <> l.q_id
        group by 1, 2),
      r60 as (select q_id, vec_id, adist,
              row_number() over (partition by q_id order by adist, vec_id)::bigint as rank
              from sc60)
      select q_id, rank, vec_id, adist from r60
      where rank <= ${graft.operators.Similarity.PqTopK}
      order by q_id, rank
    """,

    // c64: the per-subspace fixed-point trainer replayed CTE-for-CTE
    // (c26's discipline at subquantizer grain), then c47's serving
    // chain over the TRAINED codebook
    "c64_pq_trained" -> s"""
      with vm64 as ($PQ_VM),
      ${pqTrainChain("t", "vm64")},
      ${pqServeCtes(s"tcb$QITERS", "64", "vm64")}
      select q_id, rank, vec_id, adist from r64
      where rank <= $PTOPK
      order by q_id, rank
    """,

    // c65: residual IVFADC — residuals v − centroid(assigned) under
    // c60's exact assignment ranking, subquantizer TRAINED ON
    // RESIDUALS (seed = first-16 residuals), per-(query, probed
    // cluster) LUTs built from the query's own residual
    "c65_ivfpq_residual" -> s"""
      with cc as (select vec_id as c_id, embedding as c_emb from embeddings where vec_id < $NC),
      ${residualServeChain("z", "cc")}
      select q_id, rank, vec_id, adist from zr
      where rank <= $PTOPK
      order by q_id, rank
    """,

    // c71: the fully trained IVFPQ — c26's fixed-point coarse trainer
    // AND the per-subspace residual trainer replayed CTE-for-CTE in
    // one query, then the per-cluster-LUT serving chain
    "c71_ivfpq_trained" -> C71_SQL,

    // c79: stored-index serving ≡ c71 row-for-row (same training
    // contract, same rounded cells, same ranking) — the oracle
    // replays the training chain into the same logical artifacts, so
    // the persisted-index path is hash-checked against the exact SQL
    // the per-invocation compose already passes
    "c79_stored_serving" -> C71_SQL,

    // c81: incremental append — BOTH trainers read only the base
    // slice (the index c79 would have built before the delta
    // arrived), while assignment, encode, and serving read the whole
    // corpus: exactly the asymmetry of appending under stored
    // artifacts without retraining
    "c81_index_append" -> C81_SQL,
    "c82_index_churn" -> C82_SQL,
    "c87_index_health" -> C87_SQL,
    // c131: the stored serve's chain with the candidate-side label
    // predicate — pre-filtered top-k at full depth
    "c131_filtered_ann" -> C131_SQL,
    "c144_cluster_mix" -> c144Sql,
    "c145_jl_audit" -> c145Sql,
    "c147_proj_serve" -> c147Sql,
    "c148_door_schedule" -> c148Sql,
    "c149_cms_merge" -> c149Sql,
    "c150_hist_drift" -> c150Sql,
    "c152_mask_budget" -> c152Sql,
    "c153_door_ledger" -> c153Sql,
    "c154_hll_distinct" -> c154Sql,
    "c155_hll_merge" -> c155Sql,
    "c156_hll_vintage" -> c156Sql,
    "c158_sketch_route" -> c158Sql,
    "c159_band_health" -> c159Sql,
    "c160_novelty_quota" -> c160Sql,
    "c161_door_mask" -> c161Sql,
    "d11_chunk_hll" -> d11Sql,
    "c162_sketch_adc" -> c162Sql,
    // c163: sample-trained byte BPE — c75's chain, weights cut to the
    // md5 train buckets, priced over the full corpus
    "c163_bpe_sampled" -> C163_SQL,
    // c164: door-side packing — the schedule history's one cumulative
    // token window, sequence-cut by c111's budget arithmetic
    "c164_door_pack" -> c164Sql,
    // c165: quality → novelty quota → global budget, one replay
    "c165_novelty_door" -> c165Sql,
    // c166: base vs union register tables, PSI at rank grain
    "c166_register_drift" -> c166Sql,
    // c167: door-maintained register log, max-merge ≡ one-pass
    "c167_register_door" -> c167Sql,
    // c168: register-PSI between the log's pre-latest-poll and full states
    "c168_door_drift" -> c168Sql,
    // d12: the chunk-register door — d11's counter maintained live
    "d12_chunk_register_door" -> d12Sql,
    // c169: the self-contained loop — log registers price the quotas
    "c169_log_novelty_door" -> c169Sql,
    // c170: compaction audit — per-batch log rows vs the merged snapshot
    "c170_log_compaction" -> c170Sql,
    // c171: batched-argmax trainer — selection slots unrolled per step
    "c171_bpe_batched" -> C171_SQL,
    // c172: exact + batched chains off one header, compression per trainer
    "c172_bpe_batch_audit" -> C172_SQL,
    // c173: the door-log compaction audit — packed replay per shard
    "c173_pack_compaction" -> c173Sql,
    // c174: the five-gate store inventory — per-store key sets off the replay
    "c174_door_compaction" -> c174Sql,
    // c175: the histogram door — sum-over-log ≡ one-pass bins
    "c175_hist_door" -> c175Sql,
    // c176: drift off the histogram log — c150's arithmetic, door base cut
    "c176_door_hist_drift" -> c176Sql,
    // c177: the sample door — per-source Gumbel top-k over the log
    "c177_sample_door" -> c177Sql,
    // c178: snapshot ∪ tail serve — the truncated-log read path
    "c178_snapshot_serve" -> c178Sql,
    // c179: one unrolled batched chain per width, nested-WITH scoped
    "c179_bpe_batch_sweep" -> C179_SQL,
    // c133: c87's error chain read at the query slice
    "c133_query_ood" -> C133_SQL,
    // c136: one full-probe serve pass, every level cut from it
    "c136_nprobe_sweep" -> c136Sql,
    // c138: c87's router flag over the churned serve chain — ADC leg
    // for in-distribution queries, exact cosine leg for flagged ones
    "c138_routed_serve" -> s"""
      with $C87_CHAIN,
      q138 as (
        select vec_id as q_id, cluster,
               round(qerr_e4 / 10000.0, 4) as q_qerr
        from h87 where vec_id < $NQ),
      flag as (
        select q.q_id,
               (round(q.q_qerr / g.mean_qerr, 4)
                 > ${graft.operators.Similarity.OodRatioBar}) as ood
        from q138 q join g87 g using (cluster)),
      adc as (
        select yr.q_id, yr.rank, yr.vec_id, yr.adist as score,
               'adc' as path
        from yr join flag on flag.q_id = yr.q_id
        where not flag.ood and yr.rank <= $PTOPK),
      exq as (
        select e.vec_id as q_id, e.embedding as q_emb
        from uemb e join flag on flag.q_id = e.vec_id
        where flag.ood),
      exs as (
        select q.q_id, e.vec_id,
               ${cosN("q.q_emb", "e.embedding")} as cos
        from uemb e cross join exq q
        where e.vec_id <> q.q_id),
      exr as (
        select q_id, vec_id, cos,
               row_number() over (partition by q_id
                 order by cos desc nulls last, vec_id)::bigint as rank
        from exs),
      exact as (
        select q_id, rank, vec_id, cos as score, 'exact' as path
        from exr where rank <= $PTOPK)
      select q_id, rank, vec_id, score, path
      from (select * from adc union all select * from exact)
      order by q_id, rank
    """,
    "c122_index_repair" -> c122Sql,
    "c123_repaired_serve" -> c123Sql,

    // c70: residual-vs-plain recall at the default dial — factored
    // above (C70_SQL) so c78 serves the same report over the
    // clustered derivation
    "c70_adc_variants" -> C70_SQL,

    // c66: the IVFADC recall audit — one cell per (nprobe, m_budget),
    // each replaying c60's pruned serving at that dial setting
    // (truncated-code adist = rounded sum over m < budget), recall
    // against c6's exact chain; queries a cell surfaces nothing for
    // read recall 0 via the query grid
    "c66_ivfpq_recall" -> s"""
      with $C47_CELLS,
      $IVF_ASSIGN,
      q6 as (select vec_id as q_id, embedding as q_emb from embeddings where vec_id < $NQ),
      sc6 as (
        select q6.q_id, e.vec_id,
               ${cosN("q6.q_emb", "e.embedding")} as cos
        from embeddings e cross join q6
        where e.vec_id <> q6.q_id),
      ex as (select q_id, vec_id from (
               select q_id, vec_id,
                      row_number() over (partition by q_id order by cos desc nulls last, vec_id) as rk
               from sc6)
             where rk <= $PTOPK),
      ${c66Cells.mkString(",")},
      cells as (${c66CellSelects.mkString(" union all ")})
      select nprobe, m_budget, count(*) as n_queries,
             round(avg(round(n_hits::double / $PTOPK, 4)), 4) as mean_recall
      from cells group by nprobe, m_budget
      order by nprobe, m_budget
    """,

    // c55: c47's ranked chain ∩ c6's exact chain at (q_id, vec_id)
    // grain; denominator = the requested k on both engines
    "c55_pq_recall" -> s"""
      with $C47_CHAIN,
      a as (select q_id, vec_id from r47
            where rank <= ${graft.operators.Similarity.PqTopK}),
      q6 as (select vec_id as q_id, embedding as q_emb from embeddings where vec_id < $NQ),
      sc6 as (
        select q6.q_id, e.vec_id,
               ${cosN("q6.q_emb", "e.embedding")} as cos
        from embeddings e cross join q6
        where e.vec_id <> q6.q_id),
      ex as (select q_id, vec_id from (
               select q_id, vec_id,
                      row_number() over (partition by q_id order by cos desc nulls last, vec_id) as rk
               from sc6)
             where rk <= ${graft.operators.Similarity.PqTopK}),
      h as (select a.q_id, count(ex.vec_id)::bigint as n_hits
            from a left join ex on a.q_id = ex.q_id and a.vec_id = ex.vec_id
            group by a.q_id)
      select q_id, n_hits,
             round(n_hits::double / ${graft.operators.Similarity.PqTopK}, 4) as recall
      from h order by q_id
    """,

    // c52: H = log2(n) − Σ tf·log2(tf)/n off the same tokenization;
    // single-term docs have zero entropy and no defined ratio
    "c52_token_entropy" -> s"""
      with tf as materialized (
        select doc_id, term, count(*)::bigint as tf
        from (select doc_id, unnest(string_split(text, ' ')) as term from documents)
        group by 1, 2),
      sig as materialized (
        select doc_id, sum(tf)::bigint as n_tokens, count(*)::bigint as vocab,
               sum(tf::double * log2(tf::double)) as tlt
        from tf group by doc_id)
      select doc_id, n_tokens, vocab,
             case when vocab = 1 then 0.0
               else ${Rz("log2(n_tokens::double) - tlt / n_tokens", 4)}
               end as entropy,
             case when vocab > 1
               then ${Rz("""(log2(n_tokens::double) - tlt / n_tokens)
                          / log2(vocab::double)""", 4)} end as entropy_ratio
      from sig order by doc_id
    """,

    // c53: the c2 evidence chain at source grain — canonical
    // (min, max) source ordering, pair + touched-doc counts
    "c53_cross_source_dup" -> s"""
      with ${J2_CHAIN(graft.operators.Dedup.DeltaNearBar)},
      o as (select least(sa.source, sb.source) as source_a,
                   greatest(sa.source, sb.source) as source_b,
                   j2.doc_a, j2.doc_b
            from j2 join documents sa on j2.doc_a = sa.doc_id
                    join documents sb on j2.doc_b = sb.doc_id),
      pc as (select source_a, source_b, count(*)::bigint as n_pairs
             from o group by 1, 2),
      e as (select source_a, source_b, doc_a as d from o
            union all select source_a, source_b, doc_b from o),
      dc as (select source_a, source_b, count(distinct d)::bigint as n_docs
             from e group by 1, 2)
      select source_a, source_b, n_pairs, n_docs
      from pc join dc using (source_a, source_b)
      order by source_a, source_b
    """,

    // c54: c43's bucket+rank chain with two label joins; consistency
    // rounded before the mean, mean rounded after
    "c54_label_consistency" -> s"""
      with $SIGN_BUCKETS,
      p as (
        select * from (
          select a.vec_id as va, b.vec_id as vb,
                 round(${cosine("a.embedding", "b.embedding")}, 4) as cos
          from v a join v b on a.bucket = b.bucket and a.vec_id < b.vec_id)
        where cos is not null and not isnan(cos)),
      ek as (select va as vec_id, vb as nbr, cos from p
             union all
             select vb as vec_id, va as nbr, cos from p),
      rk as (select vec_id, nbr from (
               select vec_id, nbr,
                      row_number() over (partition by vec_id order by cos desc, nbr) as rank
               from ek)
             where rank <= ${graft.operators.Similarity.KnnK}),
      pv as (select rk.vec_id, la.label,
                    round(sum(case when la.label = lb.label then 1 else 0 end)::double
                          / count(*), 4) as consistency
             from rk join embeddings la on rk.vec_id = la.vec_id
                     join embeddings lb on rk.nbr = lb.vec_id
             group by rk.vec_id, la.label)
      select label, count(*)::bigint as n_vecs,
             round(avg(consistency), 4) as mean_consistency
      from pv group by label order by label
    """,

    // c50: c1's keep-first + c20's overlap + c23's cascade composed
    // first-fail over the non-benchmark population; bar interpolated
    "c50_curation_funnel" -> s"""
      with pop as (select * from documents where doc_id % 97 <> 0),
      kd as (select md5(text) as h, min(doc_id) as keep_doc from pop group by 1),
      sh as ($SH8),
      bench as (select distinct sh8 from sh where doc_id % 97 = 0),
      ct as (
        select sh.doc_id, round(count(bench.sh8)::double / count(*), 4) as contam
        from sh left join bench on sh.sh8 = bench.sh8
        where sh.doc_id % 97 <> 0
        group by sh.doc_id),
      sig as (
        select doc_id,
               len(w) as n_tokens,
               round(len(list_filter(w, t -> list_contains($markers, t)))::double / len(w), 4) as en_score,
               round(((length(text) - length(replace(text, 'th', ''))) / 2
                    + (length(text) - length(replace(text, 'he', ''))) / 2
                    + (length(text) - length(replace(text, 'in', ''))) / 2
                    + (length(text) - length(replace(text, 'er', ''))) / 2
                     )::double / length(text), 4) as en_ngram_score,
               round(len(list_distinct(w))::double / len(w), 4) as distinct_ratio,
               len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+'))
                 + len(regexp_extract_all(text, '[0-9]+')) as n_pii
        from (select doc_id, text, string_split(text, ' ') as w from pop)),
      dec as (
        select p.doc_id,
               case when p.doc_id <> kd.keep_doc then 'duplicate'
                    when coalesce(ct.contam, 0) >= ${graft.operators.TextAnalysis.FunnelContamBar}
                      then 'contaminated'
                    when n_tokens < 5 then 'too_short'
                    when not (en_score > 0.01 or en_ngram_score > 0.02) then 'non_en'
                    when distinct_ratio < 0.3 then 'repetitive'
                    when n_pii > 20 then 'pii_heavy'
                    else 'keep' end as stage
        from pop p
        join kd on md5(p.text) = kd.h
        left join ct on ct.doc_id = p.doc_id
        join sig on sig.doc_id = p.doc_id),
      t as (select count(*) as total from pop)
      select (case stage when 'duplicate' then 1 when 'contaminated' then 2
                when 'too_short' then 3 when 'non_en' then 4 when 'repetitive' then 5
                when 'pii_heavy' then 6 else 7 end)::bigint as stage_order,
             stage, count(*) as n_docs,
             round(count(*)::double / t.total, 4) as share
      from dec, t group by stage, t.total order by stage_order
    """,

    // c48: c41's signal spellings + the pinned logistic model; every
    // signal rounded before the one fixed-order dot product, score
    // rounded before the threshold
    "c48_quality_classifier" -> s"""
      with tf as materialized (
        select doc_id, term, count(*)::bigint as tf
        from (select doc_id, unnest(string_split(text, ' ')) as term from documents)
        group by 1, 2),
      sig as materialized (
        select doc_id,
               sum(tf)::bigint as n_words,
               round(sum(tf * length(term))::double / sum(tf), 4) as mean_word_len,
               round(sum(case when regexp_matches(term, '^[a-z]+$$') then tf else 0 end)::double
                     / sum(tf), 4) as alpha_frac,
               round(sum(case when list_contains($markers, term) then tf else 0 end)::double
                     / sum(tf), 4) as stop_frac,
               round(count(*)::double / sum(tf), 4) as distinct_ratio
        from tf group by doc_id),
      sc as (
        select *,
               round(1.0 / (1.0 + exp(-(
                 ${graft.operators.TextAnalysis.QcWLogWords} * round(log10(n_words::double), 4)
                 + ${graft.operators.TextAnalysis.QcWMeanLen} * mean_word_len
                 + ${graft.operators.TextAnalysis.QcWAlpha} * alpha_frac
                 + ${graft.operators.TextAnalysis.QcWStop} * stop_frac
                 + ${graft.operators.TextAnalysis.QcWDistinct} * distinct_ratio
                 + ${graft.operators.TextAnalysis.QcBias}))), 4) as score
        from sig)
      select doc_id, n_words, mean_word_len, alpha_frac, stop_frac, distinct_ratio, score,
             (case when score >= ${graft.operators.TextAnalysis.QcThreshold}
               then 1 else 0 end)::bigint as keep
      from sc order by doc_id
    """,

    // c49: integer-exact feature hashing — bucket and sign are md5
    // slices of the term, sums are bigints, the vector checksum is
    // c14's hex-domain contract; dim interpolated
    "c49_feature_hash" -> s"""
      with tf as (
        select doc_id, term, count(*)::bigint as tf
        from (select doc_id, unnest(string_split(text, ' ')) as term from documents)
        group by 1, 2),
      b as (
        select doc_id,
               ('0x' || substr(md5(term), 1, 7))::bigint % ${graft.operators.TextAnalysis.FhDim} as j,
               case when ('0x' || substr(md5(term), 8, 1))::bigint % 2 = 0
                 then tf else -tf end as sv
        from tf),
      d as (select doc_id, j, sum(sv)::bigint as s from b group by 1, 2),
      v as (
        select dd.doc_id, i.i, coalesce(d.s, 0) as s
        from (select distinct doc_id from tf) dd
        cross join unnest(range(0, ${graft.operators.TextAnalysis.FhDim})) i(i)
        left join d on d.doc_id = dd.doc_id and d.j = i.i)
      select doc_id,
             sum(case when s != 0 then 1 else 0 end)::bigint as nnz,
             sum(abs(s))::bigint as l1,
             md5(array_to_string(list(s order by i), ',')) as vec_md5
      from v group by doc_id order by doc_id
    """,

    // c44: (source, term) frequency grain off the same tokenization;
    // head depth interpolated; regr_slope = both engines' shared
    // population-OLS definition, rounded after the aggregate
    "c44_zipf_diversity" -> s"""
      with t as (select doc_id, unnest(string_split(text, ' ')) as term from documents),
      tf as (select doc_id, term, count(*) as tf from t group by 1, 2),
      st as (select d.source, tf.term, sum(tf.tf)::bigint as freq
             from tf join documents d using (doc_id) group by 1, 2),
      base as (select source, sum(freq)::bigint as n_tokens, count(*)::bigint as vocab,
                      sum(case when freq = 1 then 1 else 0 end)::bigint as hapax
               from st group by source),
      head as (select source, term, freq,
                      row_number() over (partition by source order by freq desc, term) as rank
               from st qualify rank <= ${graft.operators.TextAnalysis.ZipfTopK}),
      hh as (select source, sum(freq)::bigint as head_mass,
                    regr_slope(log10(freq::double), log10(rank::double)) as slope
             from head group by source),
      nd as (select source, count(*)::bigint as n_docs from documents group by source)
      select nd.source, n_docs, n_tokens, vocab,
             round(vocab::double / n_tokens, 4) as ttr,
             round(hapax::double / vocab, 4) as hapax_frac,
             round(head_mass::double / n_tokens, 4) as head_mass_frac,
             ${Rz("slope", 4)} as zipf_slope
      from nd join base using (source) join hh using (source)
      order by source
    """,

    // c45: c13's md5 percent cut + c1's exact-hash join + c2's
    // df-capped evidence, oriented delta←base; split/bar interpolated
    "c45_delta_dedup" -> s"""
      with ${J2_CHAIN(graft.operators.Dedup.DeltaNearBar)},
      bk as (select doc_id,
                    ('0x' || substr(md5(doc_id::varchar), 1, 7))::bigint % 100
                      < ${graft.operators.Dedup.DeltaBasePct} as is_base
             from documents),
      delta as (select doc_id from bk where not is_base),
      bh as (select md5(d.text) as h, min(d.doc_id) as exact_doc
             from documents d join bk using (doc_id) where bk.is_base group by 1),
      ex as (select dd.doc_id, bh.exact_doc
             from documents dd join delta using (doc_id)
             left join bh on md5(dd.text) = bh.h),
      orient as (select case when ba.is_base then doc_b else doc_a end as doc_id,
                        case when ba.is_base then doc_a else doc_b end as near_doc, jac
                 from j2 join bk ba on j2.doc_a = ba.doc_id),
      near0 as (select o.* from orient o
                join bk nb on o.near_doc = nb.doc_id
                join bk db on o.doc_id = db.doc_id
                where nb.is_base and not db.is_base),
      best as (select doc_id, near_doc, jac
               from near0
               qualify row_number() over (partition by doc_id order by jac desc, near_doc) = 1)
      select ex.doc_id,
             case when exact_doc is not null then 'dup_exact'
                  when near_doc is not null then 'dup_near'
                  else 'new' end as decision,
             coalesce(exact_doc, near_doc) as match_doc,
             case when exact_doc is null then jac end as jaccard
      from ex left join best using (doc_id)
      order by ex.doc_id
    """,

    // c51: the c2 evidence chain swept across the bar list (all
    // interpolated; bars forced to double so both engines bind the
    // same binary64 literals)
    "c51_dedup_sweep" -> s"""
      with ${J2_CHAIN(graft.operators.Dedup.SweepBars.min)},
      e as (select doc_a as doc_id, jac from j2
            union all select doc_b as doc_id, jac from j2),
      dm as (select doc_id, max(jac) as mx from e group by 1),
      bars as (select unnest(${graft.operators.Dedup.SweepBars
        .map(b => s"$b::double").mkString("[", ",", "]")}) as bar),
      pc as (select b.bar, count(*)::bigint as n_pairs
             from bars b join j2 on j2.jac >= b.bar group by 1),
      dc as (select b.bar, count(*)::bigint as n_docs
             from bars b join dm on dm.mx >= b.bar group by 1)
      select b.bar, coalesce(pc.n_pairs, 0)::bigint as n_pairs,
             coalesce(dc.n_docs, 0)::bigint as n_docs
      from bars b left join pc using (bar) left join dc using (bar)
      order by bar
    """,

    // c46: c19's bigram extraction; conditional add-1 estimates with
    // the context marginal reduced off the bigram table
    "c46_bigram_logprob" -> s"""
      with t as (
        select doc_id, unnest([w[i]||' '||w[i+1] for i in range(1, len(w))]) as bigram
        from (select doc_id, string_split(text, ' ') as w from documents)),
      db as (select doc_id, bigram, count(*) as k from t group by 1, 2),
      cb as (select bigram, sum(k)::bigint as cab,
                    string_split(bigram, ' ')[1] as ctx
             from db group by bigram),
      cx as (select ctx, sum(cab)::bigint as cctx from cb group by ctx),
      v as (select count(distinct term)::bigint as vsz
            from (select unnest(string_split(text, ' ')) as term from documents)),
      s as (select db.doc_id, db.k, cb.cab, cx.cctx
            from db join cb using (bigram) join cx using (ctx))
      select doc_id, sum(k)::bigint as n_bigrams,
             ${Rz("sum(k * log10((cab + 1)::double / (cctx + vsz))) / sum(k)", 4)} as mean_logprob
      from s, v group by doc_id order by doc_id
    """,

    "c24_source_stats" -> """
      select source, count(*) as n_docs,
             count(distinct md5(text)) as n_uniq,
             round(1.0 - count(distinct md5(text))::double / count(*), 4) as dup_rate,
             round(avg(n_chars), 4) as avg_chars,
             count(distinct lang) as n_langs
      from documents group by source order by source
    """,

    // c69: c11's winnow chain exploded to df-capped fingerprint
    // postings; containment = shared/min capped-set size (c42's
    // orientation at sketch cost), jaccard alongside; sizes count the
    // CAPPED sets (c2's convention)
    "c69_winnow_pairs" -> s"""
      with $C69_CTES
      $C69_SELECT
    """,

    // c74: the two-tier plagiarism pipeline — c69's report pairs get
    // exact c33-style span evidence (positional shingles over ONLY
    // the surfaced docs; occurrence cap on the restricted lists —
    // the subset index's own rule; spans semijoined to the report)
    "c74_winnow_spans" -> s"""
      with $C69_CTES,
      cand74 as materialized ($C69_SELECT),
      docs74 as (select distinct doc_id from (
        select doc_a as doc_id from cand74
        union all select doc_b as doc_id from cand74)),
      d74 as (select d.doc_id, string_split(d.text, ' ') as w0
              from documents d join docs74 using (doc_id)),
      sh74 as materialized (
        select doc_id, p as pos,
               substr(md5(array_to_string(w0[p+1:p+${graft.operators.Dedup.SpanShingleW}], ' ')), 1, 16) as key
        from d74, lateral (select unnest(range(0, len(w0) - ${graft.operators.Dedup.SpanShingleW - 1})) as p) t),
      keyed74 as (
        select key from sh74 group by key
        having count(*) between 2 and ${graft.operators.Dedup.SpanOccCap}),
      pr74 as (
        select a.doc_id as doc_a, a.pos as pos_a, b.doc_id as doc_b, b.pos as pos_b
        from sh74 a join keyed74 using (key) join sh74 b using (key)
        where a.doc_id < b.doc_id),
      runs74 as (
        select doc_a, doc_b, pos_a - pos_b as diag, pos_a, pos_b,
               pos_a - row_number() over (
                 partition by doc_a, doc_b, pos_a - pos_b order by pos_a) as grp
        from pr74),
      spans74 as (
        select doc_a, doc_b, min(pos_a) as a_start, min(pos_b) as b_start,
               count(*) + ${graft.operators.Dedup.SpanShingleW - 1} as n_tokens
        from runs74 group by doc_a, doc_b, diag, grp
        having count(*) + ${graft.operators.Dedup.SpanShingleW - 1} >= ${graft.operators.Dedup.SpanMinTokens})
      select s.doc_a, s.doc_b, s.a_start, s.b_start, s.n_tokens,
             c.containment, c.jaccard
      from spans74 s join cand74 c using (doc_a, doc_b)
      order by s.doc_a, s.doc_b, s.a_start, s.b_start
    """,

    "c11_fingerprint" -> """
      with h as (
        select doc_id,
               [substr(md5(w[i]||' '||w[i+1]||' '||w[i+2]),1,8) for i in range(1, len(w)-1)] as hs
        from (select doc_id, string_split(text, ' ') as w from documents)),
      m as (
        select doc_id, len(hs)::bigint as n_shingles,
               case when len(hs) >= 4
                 then [list_min(hs[i:i+3]) for i in range(1, len(hs)-2)]
                 else [list_min(hs)] end as mins
        from h),
      f as (select doc_id, n_shingles, list_sort(list_distinct(mins)) as fp from m)
      select doc_id, n_shingles, len(fp)::bigint as fp_size,
             md5(array_to_string(fp, ',')) as fp_hash
      from f order by doc_id
    """
  )
}
