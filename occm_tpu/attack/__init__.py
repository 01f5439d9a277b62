from occm_tpu.attack.pgd import pgd_attack

__all__ = ["pgd_attack"]
