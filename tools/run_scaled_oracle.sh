#!/usr/bin/env bash
# Oracle-at-scale runbook: verify the estimator gates against DuckDB at
# x10 events / x20 docs (the ScaledCheck corpora). One command:
#
#   bash tools/run_scaled_oracle.sh [sfDir]
#
# 1. materializes the scaled tables if absent (ScaledCheck side effect),
# 2. lays out /tmp/graft_scaled_sf as an sf-dir of symlinks whose
#    events/documents/embeddings point at the scaled copies,
# 3. runs graft.Verify for the event-based estimator gates against it,
# 4. runs tools/scaled_oracle.py (same DuckDB hash-compare as the
#    driver's sf0.01 gate) and merges mode=oracle rows into
#    SCALED_CORRECTNESS.json.
#
# p306_roc_curve is excluded: the scaled docs copy carries only
# (doc_id, text, lang, source) and that gate needs n_chars.
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.1}
SFNAME=$(basename "$SF")
LAYOUT=/tmp/graft_scaled_sf

sbt -batch "runMain graft.tools.ScaledCheck $SF"

mkdir -p "$LAYOUT"
for t in region nation customer supplier part orders lineitem; do
  ln -sfn "$SF/$t.parquet" "$LAYOUT/$t.parquet"
done
ln -sfn "/tmp/graft_scale/${SFNAME}_events_x10" "$LAYOUT/events.parquet"
ln -sfn "/tmp/graft_scale/${SFNAME}_documents_x20" "$LAYOUT/documents.parquet"
ln -sfn "/tmp/graft_scale/${SFNAME}_embeddings_x20" "$LAYOUT/embeddings.parquet"

GATES=p281_mann_whitney,p283_bh_fdr,p286_poisson_bootstrap,p288_kaplan_meier
GATES=$GATES,p289_log_rank,p290_ipw_ate,p292_rmst,p293_cmh,p294_msprt,p296_qte
GATES=$GATES,p298_km_by_group,p300_rmst_diff,p301_nelson_aalen,p302_km_greenwood
GATES=$GATES,p303_cohens_d,p304_perm_test,p308_competing_risks,p309_kruskal_wallis
GATES=$GATES,p310_trend_test,p311_cronbach,p313_neyman_sample,p314_anderson_darling
GATES=$GATES,p315_friedman,p316_by_fdr
# text family at x20 docs (documents-only inputs; p22 also reads the
# x20 embeddings, whose id offsets match the docs')
GATES=$GATES,p22_doc_similarity,p27_vocab_topk,p30_repetition,p31_decontaminate
GATES=$GATES,p32_pii_redact,p54_bm25,p65_bigram_surprisal,p76_tfidf_keywords
GATES=$GATES,p85_temperature_sample,p270_tail_mass,p271_waterfill,p285_zipf_slope
# URL family at x20 docs (arithmetic oracles, id-derived; p320 also
# reads text for the byte-length quality)
GATES=$GATES,p319_url_normalize,p320_url_dedup,p321_domain_stats,p322_robots_filter
GATES=$GATES,p324_robots_wildcards,p325_sitemap_parse,p326_politeness_schedule
# round-15 link family (arithmetic/id-derived oracles; p332 is a
# committed-fixture gate — scale-independent, so it stays at sf0.01)
GATES=$GATES,p328_url_resolve,p329_link_extract,p330_crawl_frontier
GATES=$GATES,p331_host_link_graph,p333_host_authority,p334_anchor_extract
GATES=$GATES,p335_anchor_text_agg,p336_redirect_chains,p337_page_meta
# round-15 HTML curation + image perceptual-hash families (p341's
# oracle is an EXHAUSTIVE all-pairs check — fine at sf0.01's 625
# images, quadratic at x20, so it stays at the base scale)
GATES=$GATES,p338_main_content,p339_template_clusters,p340_image_dhash
GATES=$GATES,p342_audio_pcm,p344_crawl_loop,p345_url_patterns,p346_crawl_budget
# round-16 compressed-raster decode at x20 docs (100k real PNG/JPEG
# payloads built + decoded per run; arithmetic oracles = p340's bit
# replay). p349's oracle is all-pairs like p341 — base scale only.
# p350/p351 are committed-fixture gates — scale-independent.
GATES=$GATES,p347_png_dhash,p348_jpeg_dhash,p352_gif_dhash
# round-17 decoder rungs at x20 docs (100k real images each, same
# arithmetic oracle): progressive JPEG, EXIF-orientation-normalized
# hash, WebP VP8L, Adam7 interlaced PNG
GATES=$GATES,p356_progressive_jpeg_dhash,p357_exif_oriented_dhash
GATES=$GATES,p358_webp_vp8l_dhash,p359_adam7_png_dhash
GATES=$GATES,p360_webp_oriented_dhash
# WebP governance + animation (arithmetic oracles, linear)
GATES=$GATES,p361_webp_exif_triage,p362_webp_exif_strip,p363_webp_anim_dhash
# PNG eXIf governance (arithmetic oracles, linear)
GATES=$GATES,p364_png_exif_triage,p365_png_exif_strip,p366_png_oriented_dhash
# mixed-format redaction composition (arithmetic, linear, 3x rows)
GATES=$GATES,p367_mixed_exif_redact
# round-17 multimodal rungs at x20 docs: TIFF decode (p373/p374,
# arithmetic p340 replays), audio fingerprint (p369 bit replay;
# p370's pair oracle is all-pairs over ~18k 61-bit fingerprints =
# 1.6e8 xors — seconds in DuckDB, unlike the p349/p353 image spaces
# whose 400k+ members rule theirs out), video frame sampling (p371
# composited-pixel replay; p372's join is hash-equality, not
# all-pairs)
GATES=$GATES,p369_audio_fingerprint,p370_audio_neardup
GATES=$GATES,p371_video_frame_sample,p372_video_neardup
GATES=$GATES,p373_tiff_dhash,p374_tiff_oriented_dhash
# scene cuts (LAG replay), resample round trip (p369 replay), audio
# governance pair (linear census arithmetic), and the two curation
# compositions (recursive closures over the pair replays)
GATES=$GATES,p375_video_scene_cuts,p376_audio_resample
GATES=$GATES,p377_audio_meta_triage,p378_audio_meta_strip
GATES=$GATES,p379_audio_curation,p380_video_curation
GATES=$GATES,p381_webp_anim_frames,p382_cross_container_video_neardup
GATES=$GATES,p383_subtitle_cues,p384_caption_stats,p385_tiff_gps_redact
# p353's oracle is all-pairs over 4 formats (6.5e10 comparisons at
# x20) - base scale only; p354/p355 are arithmetic and linear
GATES=$GATES,p354_exif_triage,p355_exif_strip
# dedup family members whose oracles are id-set-agnostic and linear
# (p04/p06 plant +100000-shifted twins — their id arithmetic collides
# with the x20 replica offsets, so they stay fingerprint-pinned)
GATES=$GATES,p02_dedup_exact,p05_ngram_jaccard
# round-15: the last fingerprint-only families get the oracle too.
# p03/p29 replay exact all-pairs (+ recursive-CTE closure) over the
# x20 gram stream — the heavy DuckDB rows (~15 min each: the gram
# join is sum(df^2) ~= 1.1e9 at x20); p280 is the containment recipe
# with the vacuous 1.0 fraction cap (output-identical to uncapped, so
# containmentSql is its exact oracle); p93/p33 are deterministic
# integer replays (p93 ~6 min: 3 unrolled BPE rounds over 40M
# symbols); p79's scorecard carries a measured 40000-vec branch
GATES=$GATES,p03_dedup_minhash,p29_dedup_clusters,p280_containment_frac_capped
GATES=$GATES,p93_bpe_merges,p33_quota_sample,p79_ann_ivfpq
# media triage at x20 docs (id-derived headers, arithmetic oracles)
GATES=$GATES,p312_image_header_scan,p317_webp_tiff_scan,p318_audio_header_scan
GATES=$GATES,p323_video_header_scan,p368_isobmff_header_scan
# events family at x10 events: windows/sessions/funnels/as-of/ffill —
# the corpus-sized window-op shapes, hash-compared on 1M-row outputs
GATES=$GATES,p14_events_window,p15_sessionize,p16_dedup_first_per_user
GATES=$GATES,p17_ffill_blocked,p26_asof_join,p37_sliding_window,p38_retention
GATES=$GATES,p41_funnel,p59_rolling_stats,p77_rolling_range,p100_ewma
GATES=$GATES,p175_twap,p176_ohlc

SPARK_GRAFT_VERIFY_ONLY=$GATES \
  sbt -batch "runMain graft.Verify $LAYOUT /tmp/out_scaled"
python3 tools/scaled_oracle.py "$LAYOUT" /tmp/out_scaled

# graph family: Spark dumps the planted-graph results (x4 — the pinned
# configuration), DuckDB replays them with unrolled-iteration SQL
sbt -batch "runMain graft.tools.GraphOracleDump /tmp/out_graph 4"
python3 tools/graph_oracle.py /tmp/out_graph

# re-splice the (now rev-stamped) sidecar beside fresh fingerprints
sbt -batch "runMain graft.tools.ScaledCheck $SF"
