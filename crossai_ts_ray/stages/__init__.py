"""Ray Data stages: windowing, rollup partial/merge, tier cascade, gap-fill,
compression codecs.  Each stage is a batch transform (``map_batches``) or an
explicit keyed shuffle (``groupby().map_groups``); stateful stages are
callable classes run as actor pools."""
