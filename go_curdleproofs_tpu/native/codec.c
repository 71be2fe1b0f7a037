/* Placeholder for the native BLS12-381 point codec (fast host-side
 * compress/decompress with 64-bit limb arithmetic). The Python codec in
 * go_curdleproofs_tpu/utils/codec.py is the current implementation; the hot
 * batched decompression runs on-device. */
