"""bp_osd_tpu.utils"""
