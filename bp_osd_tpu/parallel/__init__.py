"""bp_osd_tpu.parallel"""
