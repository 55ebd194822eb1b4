"""bp_osd_tpu.ops"""
