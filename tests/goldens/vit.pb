

BlogitsJ(b$P>ZѼ}~=X`>%sҽdR>&-Y>