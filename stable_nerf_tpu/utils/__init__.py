from .losses import l1_loss, l2_loss, mse_loss, mse, psnr, ssim

__all__ = ["l1_loss", "l2_loss", "mse_loss", "mse", "psnr", "ssim"]
