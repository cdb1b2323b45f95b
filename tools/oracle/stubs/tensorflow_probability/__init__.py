"""Minimal tfp shim: only tfp.stats.find_bins, matching TFP semantics
(float indices; out-of-range -> NaN)."""
import tensorflow as tf

class _Stats:
    @staticmethod
    def find_bins(x, edges):
        x = tf.convert_to_tensor(x)
        edges = tf.convert_to_tensor(edges, dtype=x.dtype)
        idx = tf.searchsorted(edges, x, side="right") - 1
        n_bins = tf.shape(edges)[0] - 1
        # x exactly at the top edge belongs to the last bin
        idx = tf.where(tf.equal(x, edges[-1]), n_bins - 1, idx)
        out = tf.cast(idx, tf.float32)
        bad = tf.logical_or(idx < 0, idx >= n_bins)
        return tf.where(bad, tf.constant(float("nan")), out)

stats = _Stats()
